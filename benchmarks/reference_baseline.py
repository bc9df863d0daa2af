"""Reference-equivalent CPU pipeline for the vs_baseline ratio.

The reference repo publishes no benchmark numbers and its mount was empty
(SURVEY.md §0/§6), so the baseline is measured from a faithful re-creation of
its execution model (SURVEY.md §3.2): host cv2 JPEG decode + letterbox per
image, a CenterNet-style convnet forward on CPU (torch, matching the
reference's CPU TF/Keras execution mode — BASELINE.json:7 pins the PR1
reference config to CPU), and host numpy 3x3-maxpool peak decode. Same
512x512 shapes, same head structure, same decode algorithm.
"""

from __future__ import annotations

import time
from typing import Tuple

import numpy as np


def _build_torch_centernet(num_classes: int = 80):
    import torch
    import torch.nn as nn

    class ConvBN(nn.Sequential):
        def __init__(self, cin, cout, k=3, s=1):
            super().__init__(
                nn.Conv2d(cin, cout, k, s, k // 2, bias=False),
                nn.BatchNorm2d(cout),
                nn.SiLU(),
            )

    class Res(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.c1, self.c2 = ConvBN(c, c), ConvBN(c, c)

        def forward(self, x):
            return x + self.c2(self.c1(x))

    class Up(nn.Module):
        def __init__(self, cin, cskip, cout):
            super().__init__()
            self.up = nn.Upsample(scale_factor=2, mode="nearest")
            self.c1 = ConvBN(cin + cskip, cout)
            self.c2 = ConvBN(cout, cout)

        def forward(self, x, skip):
            import torch

            return self.c2(self.c1(torch.cat([self.up(x), skip], 1)))

    class Net(nn.Module):
        """Mirror of cvm_tpu's "small" CenterNet (same widths/depths/heads)."""

        def __init__(self):
            super().__init__()
            w = (32, 64, 128, 256, 512)
            d = (1, 2, 2, 2)
            self.stem = ConvBN(3, w[0], s=2)
            self.downs = nn.ModuleList()
            self.stages = nn.ModuleList()
            cin = w[0]
            for wi, di in zip(w[1:], d):
                self.downs.append(ConvBN(cin, wi, s=2))
                self.stages.append(nn.Sequential(*[Res(wi) for _ in range(di)]))
                cin = wi
            self.up16 = Up(512, 256, 128)
            self.up8 = Up(128, 128, 128)
            self.up4 = Up(128, 64, 128)
            self.hm = nn.Sequential(ConvBN(128, 64), nn.Conv2d(64, num_classes, 1))
            self.off = nn.Sequential(ConvBN(128, 64), nn.Conv2d(64, 2, 1))
            self.size = nn.Sequential(ConvBN(128, 64), nn.Conv2d(64, 2, 1))

        def forward(self, x):
            x = self.stem(x)
            feats = []
            for dwn, st in zip(self.downs, self.stages):
                x = st(dwn(x))
                feats.append(x)
            c2, c3, c4, c5 = feats
            h = self.up16(c5, c4)
            h = self.up8(h, c3)
            h = self.up4(h, c2)
            return self.hm(h), self.off(h), self.size(h)

    return Net().eval()


def _host_decode(hm: np.ndarray, off: np.ndarray, size: np.ndarray, stride: int, k: int):
    """Reference-style host peak decode (numpy, per batch)."""
    prob = 1.0 / (1.0 + np.exp(-hm))
    B, C, H, W = prob.shape
    pad = np.pad(prob, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-1)
    pooled = np.max(
        np.stack([pad[:, :, dy : dy + H, dx : dx + W] for dy in range(3) for dx in range(3)]),
        axis=0,
    )
    peaks = np.where(pooled == prob, prob, 0.0).reshape(B, -1)
    idx = np.argsort(-peaks, axis=1)[:, :k]
    scores = np.take_along_axis(peaks, idx, 1)
    c = idx // (H * W)
    pix = idx % (H * W)
    py, px = pix // W, pix % W
    boxes = np.zeros((B, k, 4), np.float32)
    for b in range(B):
        o = off[b][:, py[b], px[b]]  # (2, k)
        s = size[b][:, py[b], px[b]]  # (2, k)
        cx = (px[b] + o[0]) * stride
        cy = (py[b] + o[1]) * stride
        boxes[b] = np.stack([cx - s[0] * stride / 2, cy - s[1] * stride / 2,
                             cx + s[0] * stride / 2, cy + s[1] * stride / 2], -1)
    return boxes, scores, c


def measure_reference_cpu(
    num_images: int = 8,
    input_hw: Tuple[int, int] = (512, 512),
    src_hw: Tuple[int, int] = (720, 1280),
    num_classes: int = 80,
    threads: int = 1,
) -> dict:
    """images/sec + p50 latency of the reference-equivalent CPU pipeline."""
    import io

    import cv2
    import torch
    from PIL import Image

    torch.set_num_threads(threads)
    net = _build_torch_centernet(num_classes)

    rng = np.random.default_rng(0)
    jpegs = []
    for _ in range(num_images):
        arr = rng.integers(0, 255, (*src_hw, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())

    H, W = input_hw
    lat = []
    with torch.no_grad():
        for data in jpegs:
            t0 = time.perf_counter()
            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            h, w = img.shape[:2]
            scale = min(H / h, W / w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            canvas = np.zeros((H, W, 3), np.uint8)
            oy, ox = (H - nh) // 2, (W - nw) // 2
            canvas[oy : oy + nh, ox : ox + nw] = resized
            x = torch.from_numpy(canvas[None].astype(np.float32) / 127.5 - 1.0).permute(0, 3, 1, 2)
            hm, off, size = net(x)
            _host_decode(hm.numpy(), off.numpy(), size.numpy(), stride=4, k=100)
            lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat[1:] if len(lat) > 1 else lat)  # drop first (warmup)
    return {
        "images_per_sec": float(1.0 / lat.mean()),
        "p50_latency_ms": float(np.percentile(lat, 50) * 1e3),
        "num_images": num_images,
    }
