"""Model zoo: centernet, semseg, depth, multitask, dmds.

Mirrors the reference's ``models/<name>/{params, model, loss, processor}``
layout and its ``create_model(params)`` entry points (SURVEY.md §2 "Model
zoo", BASELINE north-star "same model zoo entry points"), with flax.linen
modules in NHWC bf16 compute / fp32 params.
"""

from cvm_tpu.models.registry import get_model_zoo, register_model, get_model  # noqa: F401
