"""cvm_tpu — a TPU-native computer-vision framework.

A from-scratch JAX/XLA/Pallas rebuild of the *capabilities* of the reference
Keras/OpenCV stack ``j-o-d-o/computer-vision-models`` (autonomous-driving CV:
CenterNet-style detection, semantic segmentation, dense monocular depth,
shared-backbone multitask, and two-frame depth-from-motion), re-designed
TPU-first:

- the per-sample path (letterbox resize, augmentation, normalization,
  heatmap/mask ground-truth rendering) runs **on device** as fused XLA/Pallas
  ops instead of host OpenCV/NumPy loops;
- postprocessing (3x3 max-pool peak extraction for NMS-free detection, semseg
  argmax+colorize, depth upsampling) is fused into the jitted forward pass;
- training scales over a ``jax.sharding.Mesh`` (data/model axes) with XLA
  collectives over ICI — no NCCL/MPI;
- the label store is a self-contained packed record format (``.cvrec``)
  replacing the reference's MongoDB, with name-compatible dataset adapter
  entry points (KITTI / COCO / NuScenes / comma10k).

Layout:
    ops/        device-side image ops, GT renderers, decoders (XLA + Pallas)
    models/     model zoo: centernet, semseg, depth, multitask, dmds
    data/       packed records, dataset adapters, host loader
    parallel/   mesh construction + sharding rules
    train/      jitted/pjitted train loop, checkpoints, metrics
    infer/      end-to-end jitted predict+decode pipelines (benchmark surface)
    native/     C++ (libjpeg) batch JPEG decoder with ctypes bindings
    utils/      CLI/config plumbing, profiling helpers
"""

__version__ = "0.1.0"


def get_model(name: str):
    """Zoo lookup: name → ModelSpec (lazy import keeps bare import cheap)."""
    from cvm_tpu.models.registry import get_model as _get

    return _get(name)


def create_model(name: str, params=None, **overrides):
    """Convenience: build (model, params) for a zoo entry in one call."""
    spec = get_model(name)
    cfg = params if params is not None else spec.params_cls(**overrides)
    return spec.create_model(cfg), cfg
