"""Model-zoo registry: name → (params, create_model, loss, processor, decode).

One registry mapping zoo names to their components, mirroring the reference's
"same model zoo entry points" contract (BASELINE north-star; SURVEY.md §5
"Config/flag system").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    params_cls: type
    create_model: Callable[[Any], Any]
    loss_fn: Callable[..., Any]
    make_processor: Callable[[Any, bool], Callable]
    decode_fn: Optional[Callable[..., Any]] = None


_REGISTRY: Dict[str, Callable[[], ModelSpec]] = {}


def register_model(name: str, builder: Callable[[], ModelSpec]) -> None:
    _REGISTRY[name] = builder


def get_model(name: str) -> ModelSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def get_model_zoo():
    return sorted(_REGISTRY)


def build_model(spec: ModelSpec, cfg, mesh=None):
    """create_model, passing the mesh through for configs whose execution
    layout needs it (currently semseg's spatial_shard halo-conv path)."""
    if mesh is not None and getattr(cfg, "spatial_shard", False):
        return spec.create_model(cfg, mesh=mesh)
    return spec.create_model(cfg)


def _centernet() -> ModelSpec:
    from cvm_tpu.models.centernet import CenternetParams, centernet_loss, create_model
    from cvm_tpu.models.centernet.processor import make_processor
    from cvm_tpu.ops.decode import decode_centernet

    return ModelSpec("centernet", CenternetParams, create_model, centernet_loss,
                     make_processor, decode_centernet)


def _semseg() -> ModelSpec:
    from cvm_tpu.models.semseg import SemsegParams, create_model, semseg_loss
    from cvm_tpu.models.semseg.processor import make_processor
    from cvm_tpu.ops.decode import semseg_argmax

    return ModelSpec("semseg", SemsegParams, create_model, semseg_loss,
                     make_processor, semseg_argmax)


def _depth() -> ModelSpec:
    from cvm_tpu.models.depth import DepthParams, create_model, depth_loss
    from cvm_tpu.models.depth.processor import make_processor

    return ModelSpec("depth", DepthParams, create_model, depth_loss, make_processor)


def _multitask() -> ModelSpec:
    from cvm_tpu.models.multitask import MultitaskParams, create_model, multitask_loss
    from cvm_tpu.models.multitask.processor import make_processor

    return ModelSpec("multitask", MultitaskParams, create_model, multitask_loss, make_processor)


def _dmds() -> ModelSpec:
    from cvm_tpu.models.dmds import DmdsParams, create_model, dmds_loss
    from cvm_tpu.models.dmds.processor import make_processor

    return ModelSpec("dmds", DmdsParams, create_model, dmds_loss, make_processor)


register_model("centernet", _centernet)
register_model("semseg", _semseg)
register_model("depth", _depth)
register_model("multitask", _multitask)
register_model("dmds", _dmds)
