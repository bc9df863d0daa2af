"""Environment diagnostic: ``python -m cvm_tpu.cli.doctor``.

One command that answers "is this box ready to train/serve?" — the ops
counterpart of the reference's manual setup checklist (Mongo reachable?
OpenCV built? GPU visible?). Prints one JSON report and exits nonzero when
a REQUIRED check fails (device op, model registry); degraded-but-workable
conditions (PIL fallback decode, slow dispatch) are warnings.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_checks(probe_iters: int = 8) -> dict:
    report: dict = {"ok": True, "warnings": []}

    import jax

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    # Backend + devices.
    try:
        devs = jax.devices()
        report["platform"] = devs[0].platform
        report["device_count"] = len(devs)
        report["devices"] = [str(d) for d in devs[:8]]
    except Exception as e:
        report["ok"] = False
        report["platform_error"] = f"{type(e).__name__}: {e}"
        return report

    report["compilation_cache"] = jax.config.jax_compilation_cache_dir or None
    if not report["compilation_cache"]:
        report["warnings"].append(
            "no persistent compilation cache configured — every process "
            "restart recompiles from scratch"
        )

    # Timed device round-trip: catches a wedged remote backend and gives a
    # dispatch-floor estimate (distinct inputs per iteration — some relays
    # cache identical dispatches; CLAUDE.md).
    import numpy as np

    try:
        import jax.numpy as jnp

        x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 256)),
                        jnp.float32)
        # Compile outside the timing loop — same matmul+rescale program as
        # the probe hops below.
        ((x @ x) * (1.0 / 16.0)).block_until_ready()
        t0 = time.perf_counter()
        y = x
        for _ in range(probe_iters):
            # Renormalize each hop: a 256² N(0,1) matmul grows magnitudes
            # ~16x/iter, and once saturated to inf every dispatch has
            # byte-identical inputs — which relay caches serve without
            # touching the chip, defeating the probe (CLAUDE.md).
            y = (y @ x) * (1.0 / 16.0)
        float(y[0, 0])  # terminal readback
        dt_ms = (time.perf_counter() - t0) / probe_iters * 1e3
        report["dispatch_ms"] = round(dt_ms, 3)
        if dt_ms > 50.0:
            report["warnings"].append(
                f"device dispatch is slow ({dt_ms:.0f} ms/matmul) — remote "
                "backend degraded? perf numbers taken now are unreliable"
            )
    except Exception as e:
        report["ok"] = False
        report["device_op_error"] = f"{type(e).__name__}: {e}"

    # Model registry + one tiny forward (the library's critical path).
    try:
        from cvm_tpu.models import get_model, get_model_zoo

        report["models"] = list(get_model_zoo())
        spec = get_model("semseg")
        cfg = spec.params_cls(
            input_hw=(32, 32), num_classes=3, backbone="tiny",
            decoder_features=16, class_weights=(1.0, 1.0, 1.0), batch_size=1,
        )
        m = spec.create_model(cfg)
        import jax.numpy as jnp

        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        out = m.apply(v, jnp.zeros((1, 32, 32, 3)), train=False)
        assert out["logits"].shape == (1, 32, 32, 3)
        report["model_forward"] = "ok"
    except Exception as e:
        report["ok"] = False
        report["model_forward_error"] = f"{type(e).__name__}: {e}"

    # Native JPEG feeder (C++); PIL fallback works but is slower.
    try:
        from cvm_tpu.native import native_available

        report["native_jpeg_feeder"] = bool(native_available())
        if not report["native_jpeg_feeder"]:
            report["warnings"].append(
                "C++ JPEG feeder unavailable (no compiler or libjpeg?) — "
                "decode falls back to PIL (slower input pipeline)"
            )
    except Exception as e:
        report["native_jpeg_feeder"] = False
        report["warnings"].append(f"native probe failed: {e}")

    return report


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--probe_iters", type=int, default=8)
    args = parser.parse_args(argv)
    report = run_checks(probe_iters=args.probe_iters)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
