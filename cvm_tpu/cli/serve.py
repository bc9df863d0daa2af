"""Run an EXPORTED artifact over images or records:
``python -m cvm_tpu.cli.serve --artifact art/ --records data.cvrec``.

Deployment-side counterpart of cli.infer (which drives a checkpoint through
the model-zoo code): this loads the self-contained StableHLO artifact via
``infer.runtime.ServingModel`` — no model code — and streams batches through
it, printing JSONL results plus a throughput summary. The reference's
"run the converted TFLite on device" step (SURVEY.md §3.5), TPU-native.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--artifact", required=True, help="export_model output dir")
    parser.add_argument("--images", default=None, help="glob of image files")
    parser.add_argument("--records", default=None, help=".cvrec glob")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--score_threshold", type=float, default=0.3)
    parser.add_argument("--http", default=None, metavar="HOST:PORT",
                        help="serve the artifact as a long-lived HTTP daemon "
                             "(POST /predict with image bytes; dynamic "
                             "batching to the artifact's batch size; "
                             "/healthz, /stats, Prometheus /metrics) instead "
                             "of streaming --images/--records once")
    parser.add_argument("--max_wait_ms", type=float, default=5.0,
                        help="dynamic-batching window: a partial batch "
                             "dispatches after this long (HTTP mode)")
    parser.add_argument("--selftest", action="store_true",
                        help="verify the artifact against its export-time "
                             "fingerprint before serving (exit 3 on "
                             "mismatch — catches weights/program drift)")
    args = parser.parse_args(argv)

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    if args.selftest:
        from cvm_tpu.infer.runtime import ServingModel

        problems = ServingModel(args.artifact).selftest()
        if problems:
            for p in problems:
                print(f"[selftest] MISMATCH: {p}", file=sys.stderr)
            return 3
        print("[selftest] artifact verified against export fingerprint",
              file=sys.stderr, flush=True)

    if args.http:
        from cvm_tpu.infer.server import serve_artifact

        host, sep, port_s = args.http.rpartition(":")
        if not sep or not port_s.isdigit():
            parser.error(f"--http expects HOST:PORT, got {args.http!r}")
        host = host.strip("[]") or "127.0.0.1"  # accept [::1]:8000
        print(f"[cvm_tpu] serving {args.artifact} on http://{args.http} "
              f"(POST /predict, GET /healthz, GET /stats, GET /metrics)", file=sys.stderr,
              flush=True)
        serve_artifact(args.artifact, host, int(port_s),
                       max_wait_ms=args.max_wait_ms,
                       score_threshold=args.score_threshold)
        return 0

    from cvm_tpu.infer.runtime import ServingModel

    model = ServingModel(args.artifact)
    fmt = model.input_format
    B = int(model.meta.get("batch_size", 1))
    pad_hw = tuple(model.meta.get("pad_hw", (0, 0)))
    spec_name = model.meta.get("model", "?")
    # with_3d artifacts take a trailing intrinsics (B, 4) argument; the
    # exported config records the flag.
    with_3d = False
    cfg_path = os.path.join(args.artifact, "params.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            with_3d = bool(json.load(f).get("with_3d", False))

    from cvm_tpu.utils.batch import pad_rows

    def batches():
        if args.images:
            from cvm_tpu.data.adapters.common import read_image_as_jpeg
            from cvm_tpu.native import decode_jpeg_batch, decode_jpeg_batch_yuv420

            files = sorted(glob.glob(args.images))
            for s in range(0, len(files), B):
                chunk = files[s : s + B]
                jpegs = [read_image_as_jpeg(f)[0] for f in chunk]
                while len(jpegs) < B:
                    jpegs.append(jpegs[-1])
                if fmt == "yuv420":
                    data = decode_jpeg_batch_yuv420(jpegs, *pad_hw)
                else:
                    data = decode_jpeg_batch(jpegs, *pad_hw)
                if with_3d:
                    # No camera metadata in bare image files: identity-ish
                    # placeholder (3D geometry is meaningless without K).
                    data = data + (np.tile(
                        np.asarray([[1.0, 1.0, 0.0, 0.0]], np.float32), (B, 1)),)
                yield chunk, data
        elif args.records:
            from cvm_tpu.data.loader import RecordLoader
            from cvm_tpu.data.records import RecordDataset

            ds = RecordDataset([args.records])
            loader = RecordLoader(ds, B, pad_hw, shuffle=False, loop=False,
                                  output_format=fmt, drop_remainder=False)
            seen = 0
            for b in iter(loader):
                n = b["image_hw"].shape[0]
                names = [f"rec{seen + j}" for j in range(n)]
                seen += n
                if fmt == "yuv420":
                    data = (b["y"], b["u"], b["v"])
                    if "y_t1" in b:  # two-frame dmds artifact
                        data += (b["y_t1"], b["u_t1"], b["v_t1"])
                    data += (b["image_hw"],)
                else:
                    data = (b["image"], b["image_hw"])
                    if "image_t1" in b:
                        data += (b["image_t1"],)
                if with_3d:
                    intr = b.get("intrinsics")
                    if intr is None:
                        intr = np.tile(
                            np.asarray([[1.0, 1.0, 0.0, 0.0]], np.float32), (n, 1))
                    data = data + (np.asarray(intr, np.float32),)
                yield names, pad_rows(data, B)
        else:
            parser.error("need --images or --records")

    n_batches = 0
    n_images = 0
    t_total = 0.0
    for names, data in batches():
        if args.max_batches is not None and n_batches >= args.max_batches:
            break
        t0 = time.perf_counter()
        out = model(*data)
        out = {k: np.asarray(v) for k, v in out.items()}
        dt = time.perf_counter() - t0
        t_total += dt
        n_batches += 1
        from cvm_tpu.infer.server import result_record

        for i, name in enumerate(names):
            rec = {"input": os.path.basename(str(name)),
                   **result_record(out, i, args.score_threshold)}
            print(json.dumps(rec), flush=True)
            n_images += 1
    if n_batches:
        # First batch includes compile; report steady-state when possible.
        summary = {
            "model": spec_name, "input_format": fmt, "batches": n_batches,
            "images": n_images,
            "ms_per_batch_avg": round(t_total / n_batches * 1e3, 2),
        }
        print(json.dumps(summary), file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
