"""TP sharding-rule machinery on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from cvm_tpu.parallel.mesh import make_mesh
from cvm_tpu.parallel.sharding import make_param_shardings, shard_params


def test_rules_shard_matching_params():
    mesh = make_mesh(jax.devices(), model_axis=2)
    params = {
        "backbone": {"conv": {"kernel": jnp.zeros((3, 3, 16, 64))}},
        "hm": {"out": {"kernel": jnp.zeros((1, 1, 64, 80)), "bias": jnp.zeros((80,))}},
    }
    rules = [(r"hm/out/kernel$", P(None, None, None, "model"))]
    sh = make_param_shardings(params, mesh, rules)
    assert sh["hm"]["out"]["kernel"].spec == P(None, None, None, "model")
    assert sh["hm"]["out"]["bias"].spec == P()
    assert sh["backbone"]["conv"]["kernel"].spec == P()

    sharded = shard_params(params, mesh, rules)
    k = sharded["hm"]["out"]["kernel"]
    # sharded over the 2-device model axis → each shard holds 40 channels
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(1, 1, 64, 40)}
    b = sharded["backbone"]["conv"]["kernel"]
    assert {s.data.shape for s in b.addressable_shards} == {(3, 3, 16, 64)}


def test_compiled_train_step_contains_collectives():
    """HLO-level guard against silent replication: the sharded train step's
    COMPILED module must contain a cross-device reduction (the DP gradient
    all-reduce). If batch sharding regressed to full replication, XLA would
    need no collectives at all and this disappears — a failure mode no
    numeric equality test catches (replicated math is still correct math,
    just 8x the work)."""
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        warmup_steps=2, total_steps=10)
    tr = Trainer(spec, p, log_every=1)
    batch = synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)
    tr.init_state(batch)
    batch = jax.tree.map(lambda x: jax.device_put(x, tr._batch_sh), batch)
    compiled = tr.train_step.lower(
        tr.state, batch, jax.random.PRNGKey(0)
    ).compile()
    hlo = compiled.as_text()
    assert ("all-reduce" in hlo or "reduce-scatter" in hlo
            or "all-gather" in hlo), (
        "no cross-device collective in the compiled train step — the batch "
        "is not actually sharded over the mesh"
    )
