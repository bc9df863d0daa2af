"""Dataset adapters: raw public datasets → `.cvrec` shards.

Name-compatible with the reference's per-dataset upload scripts
(SURVEY.md §2 "Dataset uploaders": KITTI / COCO / nuScenes-nuImages /
comma10k → Mongo), but targeting the self-contained packed record store.
Each adapter exposes ``pack(src_dir, out_path, ...)`` and is wired into
``python -m cvm_tpu.cli.pack``.
"""

from cvm_tpu.data.adapters.coco import pack_coco  # noqa: F401
from cvm_tpu.data.adapters.kitti import (  # noqa: F401
    pack_kitti_depth,
    pack_kitti_multitask,
    pack_kitti_object,
    pack_kitti_raw,
    pack_kitti_semseg,
)
from cvm_tpu.data.adapters.comma10k import pack_comma10k  # noqa: F401
from cvm_tpu.data.adapters.nuimages import pack_nuimages  # noqa: F401
from cvm_tpu.data.adapters.nuscenes import pack_nuscenes  # noqa: F401

ADAPTERS = {
    "coco": pack_coco,
    "kitti": pack_kitti_object,
    "kitti_depth": pack_kitti_depth,
    "kitti_multitask": pack_kitti_multitask,
    "kitti_raw": pack_kitti_raw,
    "kitti_semseg": pack_kitti_semseg,
    "comma10k": pack_comma10k,
    "nuimages": pack_nuimages,
    "nuscenes": pack_nuscenes,
}
