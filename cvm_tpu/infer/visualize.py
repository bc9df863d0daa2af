"""Host-side result rendering (the reference's OpenCV drawing, SURVEY.md §1 L6).

Only used by the --visualize CLI flag; the hot inference path never touches
this. PIL-based to avoid a hard cv2 dependency.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cvm_tpu.models.semseg.params import SEMSEG_PALETTE


def render_sample(out_path: str, image, image_hw, outputs: Dict[str, np.ndarray],
                  score_threshold: float = 0.3) -> None:
    from PIL import Image, ImageDraw

    h, w = int(image_hw[0]), int(image_hw[1])
    img = Image.fromarray(np.asarray(image)[:h, :w].copy())
    draw = ImageDraw.Draw(img)

    if "boxes" in outputs:
        boxes = outputs["boxes"]
        scores = outputs["scores"]
        classes = outputs["classes"]
        for b, s, c in zip(boxes, scores, classes):
            if s < score_threshold:
                continue
            x0, y0, x1, y1 = [float(v) for v in b]
            color = tuple(int(v) for v in SEMSEG_PALETTE[int(c) % len(SEMSEG_PALETTE)])
            draw.rectangle([x0, y0, x1, y1], outline=color, width=2)
            draw.text((x0 + 2, max(y0 - 10, 0)), f"{int(c)}:{float(s):.2f}", fill=color)

    if "class_map" in outputs:
        cm = np.asarray(outputs["class_map"])
        pal = np.asarray(SEMSEG_PALETTE, np.uint8)
        overlay = pal[np.clip(cm, 0, len(pal) - 1)]
        ov = Image.fromarray(overlay).resize(img.size, Image.NEAREST)
        img = Image.blend(img.convert("RGB"), ov, 0.4)

    if "depth" in outputs and "class_map" not in outputs:
        d = np.asarray(outputs["depth"])[..., 0]
        dn = (255 * (1.0 - (d - d.min()) / max(d.ptp(), 1e-6))).astype(np.uint8)
        dm = Image.fromarray(dn).convert("RGB").resize(img.size)
        img = Image.blend(img.convert("RGB"), dm, 0.5)

    img.save(out_path)
