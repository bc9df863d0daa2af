"""Multitask (semseg + depth + detection) hyperparameters (SURVEY.md §2, BASELINE D)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

from cvm_tpu.utils.config import BaseParams
from cvm_tpu.models.semseg.params import SEMSEG_CLASSES


@dataclasses.dataclass
class MultitaskParams(BaseParams):
    name: str = "multitask"
    input_hw: Tuple[int, int] = (256, 640)  # NuScenes-friendly wide aspect
    batch_size: int = 8
    backbone: str = "small"
    neck_features: int = 128
    head_features: int = 64
    # detection head (NuScenes 10-class by default)
    num_det_classes: int = 10
    det_stride: int = 4
    max_objects: int = 128
    top_k: int = 100
    focal_alpha: float = 2.0
    focal_beta: float = 4.0
    min_overlap: float = 0.7
    # semseg head
    num_seg_classes: int = len(SEMSEG_CLASSES)
    class_weights: Tuple[float, ...] = (1.0, 2.0, 1.0, 2.0, 1.0)
    ignore_index: int = 255
    # Uniform label smoothing for the seg head's CE (0 = off).
    label_smoothing: float = 0.0
    # depth head
    max_depth: float = 80.0
    min_depth: float = 0.5
    num_scales: int = 1
    depth_loss_type: str = "berhu"
    # joint loss weights
    weight_det: float = 1.0
    weight_seg: float = 1.0
    weight_depth: float = 0.5
    # Homoscedastic uncertainty weighting (Kendall et al. 2018): learn one
    # log-variance s_i per task and weight L = sum exp(-s_i) L_i + 0.5 s_i,
    # REPLACING the static weight_det/seg/depth balance. The s_i live as a
    # (3,) model param ([det, seg, depth]) so the optimizer/EMA/checkpoint
    # machinery needs nothing new — but param shapes change, so set this
    # before init (like space_to_depth_stem).
    uncertainty_weighting: bool = False
    weight_offset: float = 1.0
    weight_size: float = 0.1
    # training
    learning_rate: float = 5e-4
    weight_decay: float = 1e-5
    warmup_steps: int = 500
    total_steps: int = 120_000
    aug_scale_range: Tuple[float, float] = (0.8, 1.3)
    aug_shift_frac: float = 0.05
    aug_flip_prob: float = 0.5

    @property
    def det_map_hw(self) -> Tuple[int, int]:
        return (self.input_hw[0] // self.det_stride, self.input_hw[1] // self.det_stride)
