"""Weight-only int8 PTQ: round-trip fidelity + end-to-end output closeness."""

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.infer.quantize import dequantize_params, quantization_error, quantize_params
from cvm_tpu.models import get_model


def _tiny_centernet():
    spec = get_model("centernet")
    p = spec.params_cls(input_hw=(64, 64), num_classes=3, backbone="tiny",
                        neck_features=32, head_features=16)
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return spec, p, model, variables


def test_quantize_roundtrip_structure():
    _, _, _, variables = _tiny_centernet()
    q, stats = quantize_params(variables["params"])
    assert stats["quantized"] > 10
    err = quantization_error(variables["params"], q)
    assert err < 0.02, f"per-channel int8 should be <2% relative error, got {err}"

    deq = dequantize_params(q)
    # Shapes/structure identical to the original
    orig_flat = jax.tree_util.tree_leaves(variables["params"])
    deq_flat = jax.tree_util.tree_leaves(deq)
    assert len(orig_flat) == len(deq_flat)
    for a, b in zip(orig_flat, deq_flat):
        assert a.shape == jnp.asarray(b).shape


def test_quantized_outputs_close(rng):
    spec, p, model, variables = _tiny_centernet()
    q, _ = quantize_params(variables["params"])
    deq = dequantize_params(q)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    out_fp = model.apply(variables, x, train=False)
    out_q = model.apply({"params": deq, "batch_stats": variables["batch_stats"]}, x, train=False)
    # Heatmap probabilities should barely move under weight-only int8.
    pf = np.asarray(jax.nn.sigmoid(out_fp["heatmap"]))
    pq = np.asarray(jax.nn.sigmoid(out_q["heatmap"]))
    assert np.abs(pf - pq).max() < 0.05


def test_int8_array_sizes():
    _, _, _, variables = _tiny_centernet()
    q, _ = quantize_params(variables["params"])

    def sizes(tree, pred):
        total = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v.keys()) == {"int8", "scale"}:
                    total += v["int8"].nbytes if pred == "q" else 0
                else:
                    total += sizes(v, pred)
            elif pred == "fp":
                total += np.asarray(v).nbytes
        return total

    qbytes = sizes(q, "q")
    fpbytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(variables["params"]))
    assert qbytes * 3 < fpbytes  # quantized portion is 4x smaller than fp32
