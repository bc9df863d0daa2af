"""Multi-slice (DCN) mesh construction on the 8-device CPU CI mesh.

make_mesh(dcn_slices=N) must keep the ("data", "model") axis contract (no
PartitionSpec anywhere changes between single- and multi-slice) while laying
the data axis out slice-major, so per-slice collectives ride ICI and only
one small exchange crosses DCN (parallel/mesh.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cvm_tpu.parallel.mesh import batch_sharding, make_mesh


def test_dcn_mesh_shape_and_slice_contiguity():
    devices = jax.devices()
    mesh = make_mesh(devices, model_axis=2, dcn_slices=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    # Slice-major data axis: the first two data rows must hold exactly the
    # first emulated slice's devices (ids 0-3), the last two rows ids 4-7.
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert set(ids[:2].ravel()) == {d.id for d in devices[:4]}
    assert set(ids[2:].ravel()) == {d.id for d in devices[4:]}
    # Model axis never crosses a slice boundary (TP traffic must ride ICI):
    # both devices of every model pair belong to the same 4-device block.
    for row in ids:
        assert row[0] // 4 == row[1] // 4


def test_dcn_mesh_rejects_indivisible():
    with pytest.raises(ValueError):
        make_mesh(jax.devices(), model_axis=1, dcn_slices=3)


def test_sharded_reduction_runs_on_dcn_mesh():
    """A batch-sharded computation with a cross-device reduction executes on
    the hybrid-ordered mesh and matches the unsharded result."""
    mesh = make_mesh(jax.devices(), model_axis=2, dcn_slices=2)
    x = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    gx = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def f(a):
        return jnp.sum(a * a, axis=1).mean()

    out = jax.jit(f, out_shardings=NamedSharding(mesh, P()))(gx)
    np.testing.assert_allclose(np.asarray(out), (x * x).sum(1).mean(),
                               rtol=1e-6)


def test_dcn_flag_plumbed_through_cli(tmp_path, capsys):
    """cli.train --dcn_slices 2 --model_parallel 2 builds the hybrid mesh and
    the (TP-sharded) training step runs on it end to end."""
    from cvm_tpu.cli.train import main

    wd = str(tmp_path / "run")
    rc = main([
        "--model", "semseg", "--data", "synthetic", "--steps", "2",
        "--checkpoint_every", "100", "--log_every", "1",
        "--workdir", wd, "--pad_hw", "48,48",
        "--dcn_slices", "2", "--model_parallel", "2",
        "--input_hw", "[32,32]", "--num_classes", "3", "--backbone", "tiny",
        "--decoder_features", "16", "--class_weights", "[1,1,1]",
        "--batch_size", "8", "--warmup_steps", "2", "--total_steps", "2",
        "--tensor_parallel", "true",
    ])
    assert rc == 0
    assert "done:" in capsys.readouterr().out


def test_tensor_parallel_without_model_axis_is_a_cli_error(tmp_path):
    from cvm_tpu.cli.train import main

    with pytest.raises(SystemExit):
        main([
            "--model", "semseg", "--data", "synthetic", "--steps", "1",
            "--workdir", str(tmp_path / "x"), "--tensor_parallel", "true",
            "--input_hw", "[32,32]", "--num_classes", "3",
            "--backbone", "tiny", "--decoder_features", "16",
            "--class_weights", "[1,1,1]", "--batch_size", "8",
        ])
