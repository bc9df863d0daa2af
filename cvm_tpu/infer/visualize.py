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
            x0, x1 = sorted((x0, x1))  # tolerate degenerate/inverted boxes
            y0, y1 = sorted((y0, y1))
            color = tuple(int(v) for v in SEMSEG_PALETTE[int(c) % len(SEMSEG_PALETTE)])
            draw.rectangle([x0, y0, x1, y1], outline=color, width=2)
            draw.text((x0 + 2, max(y0 - 10, 0)), f"{int(c)}:{float(s):.2f}", fill=color)

    if "centers3d" in outputs and "intrinsics" in outputs:
        # Monocular 3D wireframes (reference: KITTI 3D drawing, SURVEY.md §2
        # "CenterNet processor" optional 3D targets). Camera frame: X right,
        # Y down, Z forward; yaw rotates about the vertical (Y) axis.
        fx, fy, cx, cy = [float(v) for v in outputs["intrinsics"]]
        scores = outputs.get("scores", np.ones(len(outputs["centers3d"])))
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for k in range(len(outputs["centers3d"])):
            if float(scores[k]) < score_threshold:
                continue
            X, Y, Z = [float(v) for v in outputs["centers3d"][k]]
            if Z <= 0.5:
                continue
            bh, bw, bl = [float(v) for v in outputs["dims"][k]]
            yaw = float(outputs["yaw"][k])
            cs, sn = np.cos(yaw), np.sin(yaw)
            corners = []
            for sx in (-0.5, 0.5):
                for sy in (-0.5, 0.5):
                    for sz in (-0.5, 0.5):
                        # local (l, h, w) box, heading along local x
                        lx, ly, lz = sx * bl, sy * bh, sz * bw
                        wx = cs * lx + sn * lz + X
                        wz = -sn * lx + cs * lz + Z
                        corners.append((wx, ly + Y, wz))
            order = [0, 1, 3, 2, 4, 5, 7, 6]  # ring order per face
            corners = [corners[i] for i in order]
            pts = [((fx * x / z) + cx, (fy * y / z) + cy) for x, y, z in corners]
            cls = int(outputs.get("classes", np.zeros(1))[min(k, len(outputs.get("classes", [0])) - 1)])
            color = tuple(int(v) for v in SEMSEG_PALETTE[cls % len(SEMSEG_PALETTE)])
            for a, b in edges:
                draw.line([pts[a], pts[b]], fill=color, width=1)

    def _unletterbox(canvas: np.ndarray) -> np.ndarray:
        """Crop the letterbox content window out of a model-canvas map so
        the overlay aligns with the original image (mirrors letterbox_roi:
        scale = min(out/in), centered, pad bars outside the window). Boxes
        get the same inverse via map_boxes_to_input; stretching the WHOLE
        canvas (pad bars included) would land the overlay squashed/offset."""
        ch, cw = canvas.shape[:2]
        scale = min(ch / h, cw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        y0 = int(np.floor((ch - nh) * 0.5))
        x0 = int(np.floor((cw - nw) * 0.5))
        return canvas[y0 : y0 + max(nh, 1), x0 : x0 + max(nw, 1)]

    if "class_map" in outputs:
        cm = _unletterbox(np.asarray(outputs["class_map"]))
        pal = np.asarray(SEMSEG_PALETTE, np.uint8)
        overlay = pal[np.clip(cm, 0, len(pal) - 1)]
        ov = Image.fromarray(overlay).resize(img.size, Image.NEAREST)
        img = Image.blend(img.convert("RGB"), ov, 0.4)

    if "depth" in outputs and "class_map" not in outputs:
        d = _unletterbox(np.asarray(outputs["depth"])[..., 0])
        dn = (255 * (1.0 - (d - d.min()) / max(np.ptp(d), 1e-6))).astype(np.uint8)
        dm = Image.fromarray(dn).convert("RGB").resize(img.size)
        img = Image.blend(img.convert("RGB"), dm, 0.5)

    img.save(out_path)
