"""Gradient checkpointing (remat): numerics-invariant, memory-lever flag.

The `remat` BaseParams flag wraps every backbone ResBlock in
``nn.remat`` (jax.checkpoint): activations recompute in the backward pass.
The contract that makes it safe to toggle on an existing checkpoint:
identical param tree, identical outputs, identical gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.models import get_model


def _variables_and_batch(remat: bool):
    spec = get_model("centernet")
    cfg = spec.params_cls(
        input_hw=(64, 64), num_classes=3, max_objects=8, backbone="tiny",
        neck_features=32, head_features=16, batch_size=2,
        warmup_steps=2, total_steps=10, remat=remat,
    )
    model = spec.create_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


import pytest


@pytest.mark.slow  # 96 s measured: two full models, fwd+grads, compared
def test_remat_identical_params_outputs_grads():
    m0, v0, x = _variables_and_batch(remat=False)
    m1, v1, _ = _variables_and_batch(remat=True)

    # Same param tree (paths and values): toggling remat on an existing
    # checkpoint must be a pure execution change.
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out0 = m0.apply(v0, x, train=False)
    out1 = m1.apply(v0, x, train=False)
    for k in out0:
        np.testing.assert_array_equal(np.asarray(out0[k]), np.asarray(out1[k]))

    def loss(model, variables):
        out, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        return sum(jnp.sum(jnp.square(o.astype(jnp.float32))) for o in out.values())

    g0 = jax.grad(lambda p: loss(m0, {"params": p, "batch_stats": v0["batch_stats"]}))(v0["params"])
    g1 = jax.grad(lambda p: loss(m1, {"params": p, "batch_stats": v0["batch_stats"]}))(v0["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_remat_actually_checkpoints():
    """The backward HLO of the rematted model must recompute block convs:
    its fusion/conv count strictly exceeds the non-rematted backward's."""
    def bwd_hlo(remat):
        m, v, x = _variables_and_batch(remat=remat)

        def loss(p):
            out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                       for o in out.values())

        return jax.jit(jax.grad(loss)).lower(v["params"]).compile().as_text()

    h0 = bwd_hlo(False)
    h1 = bwd_hlo(True)
    assert h1.count("convolution") > h0.count("convolution"), (
        "remat did not add recompute convolutions to the backward pass"
    )
