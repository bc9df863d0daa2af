"""Child process for the multi-process training test.

Usage: python multiproc_child.py <process_id> <num_processes> <port> <steps>

Each process owns ``8 // num_processes`` forced CPU host devices so the
GLOBAL mesh is 8 devices regardless of the process count — the jitted train
program is then identical between a 1-process and a 2-process run, and the
loss trajectories must match. Every process generates the same deterministic
GLOBAL batch per step and hosts only its process-local slice (the same
contract as ``split_ids(process_index, process_count)`` + ``global_put``).

Prints one JSON line: {"process_id": ..., "losses": [...]}.
"""

import json
import os
import sys

pid, nproc, port, steps = (int(sys.argv[1]), int(sys.argv[2]),
                           int(sys.argv[3]), int(sys.argv[4]))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // nproc}"
)
os.environ["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 8 // nproc

import numpy as np  # noqa: E402

from cvm_tpu.models import get_model  # noqa: E402
from cvm_tpu.data.synthetic import synthetic_batch  # noqa: E402
from cvm_tpu.train.loop import Trainer  # noqa: E402

GLOBAL_BATCH = 8
PAD_HW = (96, 96)

spec = get_model("centernet")
cfg = spec.params_cls(
    input_hw=(64, 64), batch_size=GLOBAL_BATCH, backbone="tiny",
    max_objects=4, num_classes=3,
)

local_bs = GLOBAL_BATCH // nproc


def batches(n):
    for step in range(n):
        # Same global scene on every process (seeded per step), local slice
        # per host — exactly what stride-sharded record ids produce.
        rng = np.random.default_rng(10_000 + step)
        full = synthetic_batch(rng, GLOBAL_BATCH, PAD_HW, num_classes=3,
                               max_objects=4)
        yield {k: v[pid * local_bs:(pid + 1) * local_bs] for k, v in full.items()}


def barrier(name, timeout_ms=600_000):
    """Coordination-service barrier (KV-based, generous timeout).

    Gloo's rendezvous KV lookups time out after a hardcoded 30 s; on a
    single-core CI box two processes' XLA compiles serialize, so an
    unsynchronized first collective can see >30 s of skew and fail context
    init. Compile-heavy work is therefore done BEFORE a barrier, and
    cross-process execution starts right after it.
    """
    if nproc > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_ms)


trainer = Trainer(spec, cfg, log_every=1_000_000)
barrier("pre_init")  # init_state's global device_put is the 1st collective
trainer.init_state()

# AOT-compile the train step (pure compile, no execution, no collectives),
# then swap the compiled executable in — fit()'s first step executes
# immediately instead of after a multi-minute, per-process-skewed compile.
from cvm_tpu.parallel.mesh import batch_sharding, global_put  # noqa: E402

raw0 = global_put(next(batches(1)), batch_sharding(trainer.mesh))
base0 = jax.random.split(jax.random.PRNGKey(0))[1]
trainer.train_step = trainer.train_step.lower(
    trainer.state, raw0, base0).compile()
barrier("precompiled")

losses = []
for _ in range(steps):
    m = trainer.fit(batches(1), 1)
    losses.append(float(m["loss"]))

print(json.dumps({"process_id": pid, "losses": losses}), flush=True)
