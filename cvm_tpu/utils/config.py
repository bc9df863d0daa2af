"""Typed per-model config with CLI overrides (SURVEY.md §5 "Config/flag system").

The reference's per-model ``Params`` class is the config; here it is a
dataclass with ``from_cli`` overrides (``--field value``) and dict round-trip
for checkpoint metadata.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple, get_args, get_origin


def parse_hw(text: str, flag: str = "size") -> Tuple[int, int]:
    """Parse an 'H,W' CLI value with a clear error at parse time (a bad
    value must not surface later as an IndexError deep in native decode)."""
    parts = text.split(",")
    if len(parts) != 2:
        raise SystemExit(f"{flag} expects 'H,W' (two comma-separated ints), "
                         f"got {text!r}")
    try:
        h, w = int(parts[0]), int(parts[1])
    except ValueError:
        raise SystemExit(f"{flag} expects integers 'H,W', got {text!r}")
    if h <= 0 or w <= 0:
        raise SystemExit(f"{flag} must be positive, got {text!r}")
    return (h, w)


@dataclasses.dataclass
class BaseParams:
    name: str = "base"
    # Shard the widest backbone convs over the mesh "model" axis
    # (parallel/sharding.py tp_rules_for; consumed by train.loop.Trainer).
    tensor_parallel: bool = False
    # Exponential moving average of params (0 = off). When on, the train step
    # maintains a shadow param tree updated as ema = d*ema + (1-d)*p; eval,
    # checkpoints, and export use the EMA weights (Trainer.eval_params).
    ema_decay: float = 0.0
    # Accumulate gradients over k micro-batches before applying the optimizer
    # (optax.MultiSteps) — k * batch_size effective batch with unchanged
    # device memory for activations.
    grad_accum_steps: int = 1
    # LR schedule: warmup_cosine (default) | constant | step (x0.1 at
    # 60%/85% of total_steps). All keep the linear warmup.
    lr_schedule: str = "warmup_cosine"
    # Optimizer: adamw (default; decoupled weight decay via weight_decay) |
    # sgd (Nesterov momentum 0.9, the classic detector recipe — weight_decay
    # applies as decoupled decay there too).
    optimizer: str = "adamw"
    # Extra photometric augmentation (device-side): max gaussian noise sigma
    # as a fraction of 255, and 3x3-blur probability (both 0 = off).
    aug_noise_std: float = 0.0
    aug_blur_prob: float = 0.0
    # Rotation (roll) augmentation: max |angle| in degrees, applied
    # post-resample to the image AND the labels (det boxes take the AABB of
    # the rotated corners; masks/depth rotate nearest). 0 = off (the rotate
    # pass is then not even traced). DMDS ignores it — its two-frame
    # photometric geometry assumes an unrolled camera.
    aug_rotate_deg: float = 0.0
    # Quantization-aware training (train/qat.py): every conv in the compiled
    # train/eval step runs the dynamic-int8 fake-quant path with a
    # straight-through estimator, so `cli.export --quantize w8a8` inherits
    # int8-grid weights. Stateless (scales recomputed in-program); typical
    # use is a short fine-tune from an fp checkpoint with qat flipped on.
    qat: bool = False
    # Space-to-depth stem (backbones.py): stride-1 conv on (H/2, W/2, 12)
    # instead of a stride-2 conv on RGB — same receptive geometry, 4x MXU
    # lane utilization. Off = plain stride-2 RGB stem (the DESIGN §9
    # ablation lever; param shapes differ, so set it before init).
    space_to_depth_stem: bool = True
    # Gradient checkpointing (backbones.py): rematerialise each residual
    # block in the backward pass instead of keeping its activations live —
    # larger batch/resolution per chip for ~1/3 extra backbone FLOPs. Safe
    # to toggle on an existing checkpoint (params/outputs/grads unchanged).
    remat: bool = False

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BaseParams":
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in fields:
                continue
            t = fields[k].type
            if isinstance(v, list) and (get_origin(t) is tuple or "Tuple" in str(t)):
                v = tuple(v)
            kwargs[k] = v
        return cls(**kwargs)

    def replace(self, **kw) -> "BaseParams":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_cli(cls, argv: Optional[Sequence[str]] = None) -> "BaseParams":
        """Build from CLI flags: every dataclass field becomes ``--field``."""
        parser = argparse.ArgumentParser(description=cls.__doc__)
        for f in dataclasses.fields(cls):
            t = f.type
            default = getattr(cls, f.name, f.default)
            origin = get_origin(t)
            if t in (int, float, str, "int", "float", "str"):
                typ = {"int": int, "float": float, "str": str}.get(t, t)
                parser.add_argument(f"--{f.name}", type=typ, default=default)
            elif t in (bool, "bool"):
                parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"), default=default)
            elif origin is tuple or "Tuple" in str(t):
                # Element type from the annotation: Tuple[int, int] flags
                # (input_hw, pad_hw...) must parse to ints — float shapes
                # crash jit tracing ("Shapes must be ... integer type").
                elem = int if "int" in str(t) else float
                parser.add_argument(
                    f"--{f.name}",
                    type=lambda s, elem=elem: tuple(
                        elem(v) for v in (json.loads(s) if s.startswith("[")
                                          else s.split(","))),
                    default=default,
                )
            else:
                parser.add_argument(f"--{f.name}", type=str, default=default)
        ns = parser.parse_args(argv)
        return cls(**vars(ns))
