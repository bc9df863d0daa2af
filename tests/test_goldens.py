"""Golden-parity regression tests (SURVEY.md §4 item 2).

Locks the numerical behavior of the core device ops against fixtures
generated at framework round 1: any later refactor (Pallas swap, fusion
change, resize rewrite) must reproduce these outputs within fp tolerance.
"""

import os

import jax.numpy as jnp
import numpy as np

from cvm_tpu.ops.decode import decode_centernet
from cvm_tpu.ops.heatmap import render_centernet_targets
from cvm_tpu.ops.image import letterbox, letterbox_roi, map_boxes_to_output

_G = np.load(os.path.join(os.path.dirname(__file__), "goldens", "ops_goldens.npz"))


def test_letterbox_golden():
    out, roi = letterbox(jnp.asarray(_G["src_img"]), 70, 110, (48, 64))
    np.testing.assert_allclose(np.asarray(out), _G["letterboxed"], atol=1e-4)
    boxes = jnp.asarray([[5.0, 10.0, 60.0, 50.0], [30.0, 20.0, 100.0, 65.0]])
    mapped = map_boxes_to_output(boxes, roi)
    np.testing.assert_allclose(np.asarray(mapped), _G["mapped_boxes"], atol=1e-5)


def test_heatmap_golden():
    t = render_centernet_targets(
        jnp.asarray(_G["gt_boxes"]), jnp.asarray(_G["gt_classes"]),
        jnp.asarray(_G["gt_valid"]), (48, 64), 3,
    )
    np.testing.assert_allclose(np.asarray(t.heatmap), _G["heatmap"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t.offset), _G["offset"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t.size), _G["size"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t.mask), _G["mask"], atol=0)


def test_decode_golden():
    det = decode_centernet(
        jnp.asarray(_G["heatmap"])[None], jnp.asarray(_G["offset"])[None],
        jnp.asarray(_G["size"])[None], stride=4, top_k=5, from_logits=False,
    )
    # Scores are locked for every slot; boxes/classes only where score > 0.
    # Zero-score slots are padding (consumers filter on score_threshold) and
    # their box/class content is tie-ordering dependent — the round-2
    # two-stage top-k picks different (equally valid) pixels for them.
    np.testing.assert_allclose(np.asarray(det.scores), _G["det_scores"], atol=1e-6)
    valid = _G["det_scores"] > 0
    np.testing.assert_allclose(
        np.asarray(det.boxes)[valid], _G["det_boxes"][valid], atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(det.classes)[valid], _G["det_classes"][valid]
    )
