"""Dataset packing CLI: ``python -m cvm_tpu.cli.pack --dataset coco --src ... --out ...``.

The reference's per-dataset Mongo upload scripts (SURVEY.md §3.3) become one
entry point over the adapter registry.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    from cvm_tpu.data.adapters import ADAPTERS

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True, choices=sorted(ADAPTERS))
    parser.add_argument("--src", required=True, help="dataset root directory")
    parser.add_argument("--out", required=True, help="output .cvrec path")
    parser.add_argument("--split", default=None)
    parser.add_argument("--max_images", type=int, default=None)
    parser.add_argument("--depth_dir", default=None, help="kitti_depth: GT dir")
    args = parser.parse_args(argv)

    fn = ADAPTERS[args.dataset]
    kwargs = {"max_images": args.max_images}
    if args.dataset == "kitti_depth":
        if not args.depth_dir:
            parser.error("kitti_depth requires --depth_dir")
        stats = fn(args.src, args.depth_dir, args.out, **kwargs)
    else:
        if args.split:
            # Each adapter names its selector differently; forwarding the
            # wrong kwarg is a TypeError deep in the adapter.
            split_kw = {"nuimages": "version", "nuscenes": "version",
                        "comma10k": None, "kitti_raw": None}.get(args.dataset, "split")
            if split_kw is None:
                parser.error(f"--split is not supported for {args.dataset}")
            kwargs[split_kw] = args.split
        stats = fn(args.src, args.out, **kwargs)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
