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
