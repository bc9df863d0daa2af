"""Shared batch-axis padding for static-shape programs.

Compiled programs have ONE static batch shape, and under GSPMD the batch
axis must divide the device mesh — so every serving surface (pipeline,
dynamic batcher, video loop, artifact runner) pads short batches the same
way: repeat the last row. One helper so the rule cannot diverge.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def pad_rows(arrays: Sequence, total: int) -> Tuple[np.ndarray, ...]:
    """Pad each batch-first array to ``total`` rows by repeating its last
    row; no-op (beyond np.asarray) when already at ``total``."""
    out = []
    for a in arrays:
        a = np.asarray(a)
        pad = total - a.shape[0]
        if pad < 0:
            raise ValueError(
                f"batch has {a.shape[0]} rows, more than the static "
                f"batch size {total}")
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
        out.append(a)
    return tuple(out)
