"""Device mesh construction + sharding helpers (SURVEY.md §2 parallelism table).

The reference has no distributed training (single-device Keras fit); here
data-parallel scale-out is first-class and TPU-idiomatic: a
``jax.sharding.Mesh`` with ("data", "model") axes, batches sharded on
"data", parameters replicated (the zoo's convnets are far below the size
where tensor parallelism pays), and XLA inserting all collectives over ICI
under GSPMD — no NCCL/MPI analogue needed. The "model" axis exists so wide
layers *can* be sharded later without re-plumbing (SURVEY.md §5
"Distributed communication backend").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_axis: int = 1,
    dcn_slices: int = 1,
) -> Mesh:
    """Build a ("data", "model") mesh over all (or given) devices.

    ``model_axis`` devices are assigned to the model axis (default 1 =
    pure data parallelism); the rest go to data.

    ``dcn_slices > 1`` declares a multi-slice deployment (e.g. two v5e pods
    joined over DCN). The axis NAMES stay ("data", "model") — GSPMD derives
    collective hierarchy from device *placement*, not axis names, so no
    PartitionSpec anywhere in the framework changes between single- and
    multi-slice. What changes is the device ORDER inside the mesh array:
    the data axis is laid out slice-major (every contiguous block of
    ``data_per_slice`` rows lives on one slice), so the gradient all-reduce
    decomposes into a fast per-slice reduce-scatter/all-gather over ICI plus
    one small cross-slice exchange over DCN, instead of a flat ring that
    hops the slow link every step. On hardware that reports
    ``Device.slice_index`` this uses ``mesh_utils.create_hybrid_device_mesh``
    (ICI-topology-aware within each slice); elsewhere (the CPU CI mesh) it
    falls back to contiguous-block slice emulation with identical ordering
    semantics.

    TP stays intra-slice by construction: the "model" axis never crosses a
    slice boundary (Megatron-split conv activations all-reduce every layer —
    that traffic must ride ICI).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    if dcn_slices <= 1:
        arr = mesh_utils.create_device_mesh(
            (n // model_axis, model_axis), devices=np.asarray(devices)
        )
        return Mesh(arr, ("data", "model"))

    if n % (dcn_slices * model_axis) != 0:
        raise ValueError(
            f"{n} devices not divisible by dcn_slices={dcn_slices} * "
            f"model_axis={model_axis}"
        )
    per_slice = n // dcn_slices
    data_per_slice = per_slice // model_axis
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) == dcn_slices:
        arr = mesh_utils.create_hybrid_device_mesh(
            (data_per_slice, model_axis), (dcn_slices, 1), devices=devices
        )
    else:
        # CI / single-slice emulation: contiguous device blocks stand in for
        # slices. Ordering semantics match the hybrid path (slice-major data
        # axis; model axis within a slice).
        blocks = [
            np.asarray(devices[i * per_slice:(i + 1) * per_slice]).reshape(
                data_per_slice, model_axis
            )
            for i in range(dcn_slices)
        ]
        arr = np.concatenate(blocks, axis=0)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over data AND model axes.

    While parameters are replicated (no TP — these convnets are tiny relative
    to MXU capacity), folding the model axis into batch sharding keeps every
    device doing distinct work on any mesh shape; when TP layers land, their
    activations simply stop sharding batch over "model".
    """
    return NamedSharding(mesh, P(("data", "model")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(tree, sharding: NamedSharding):
    """Transfer a host pytree onto a (possibly multi-process) global sharding.

    Single-process: plain ``device_put``. Multi-process (after
    ``jax.distributed.initialize``): each process holds only its LOCAL slice
    of the batch axis (``split_ids(process_index, process_count)`` feeds each
    host a distinct stride), so the global array must be assembled from
    process-local shards — ``make_array_from_process_local_data`` — while
    replicated leaves (identical on every host) still go through
    ``device_put``, which JAX supports natively for fully-replicated specs.
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        if not sharding.spec or all(p is None for p in sharding.spec):
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch axis sharded on "data"."""
    return global_put(batch, batch_sharding(mesh))
