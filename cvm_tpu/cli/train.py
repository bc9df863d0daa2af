"""Training entry point: ``python -m cvm_tpu.cli.train --model centernet ...``.

Mirrors the reference's per-model train.py UX (``python -m models.<name>.train``,
SURVEY.md §2 "Training entry") with one registry-driven CLI.
"""

from __future__ import annotations

import argparse
import sys

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True, help="zoo name: centernet|semseg|depth|multitask|dmds")
    parser.add_argument("--data", default="synthetic",
                        help="'synthetic' or .cvrec glob(s); comma-separate "
                             "to mix datasets (matched label spaces)")
    parser.add_argument(
        "--steps", type=int, default=1000,
        help="TOTAL training steps (global step target): a run resumed from "
             "a checkpoint trains only the remainder, so re-invoking the "
             "same command is idempotent (required by --auto_restart and "
             "the persistent flagship runner, scripts/flagship_persist.sh)",
    )
    parser.add_argument("--workdir", default="runs/default")
    parser.add_argument("--checkpoint_every", type=int, default=1000)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--pad_hw", default=None, help="loader pad size 'H,W' (default: 1.5x input)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval_every", type=int, default=0,
                        help="run evaluation every N steps (0 = off)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also write TensorBoard scalar events to <workdir>/tb")
    parser.add_argument("--decode_target", default="auto",
                        help="scale-aware JPEG decode target: 'auto' (1.3x "
                             "input), 'off', or 'H,W'")
    parser.add_argument("--eval_batches", type=int, default=20)
    parser.add_argument(
        "--eval_images", type=int, default=0, metavar="N",
        help="with --eval_every and --tensorboard: render N eval samples' "
             "predictions (boxes/masks/depth via infer.visualize) into the "
             "TensorBoard Images tab at every eval — the headless analogue "
             "of the reference's OpenCV inspection windows (SURVEY.md §5)",
    )
    parser.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax NaN checking (SURVEY.md §5 sanitizer mode)",
    )
    parser.add_argument(
        "--keep_best", default=None, metavar="METRIC",
        help="with --eval_every: additionally keep the single best checkpoint "
             "by this eval metric (e.g. mAP, miou, delta1, loss_photo) in "
             "<workdir>/best — self-describing, loadable by "
             "cli.evaluate/infer/export via --checkpoint_dir <workdir>/best",
    )
    parser.add_argument("--keep_best_mode", default="max",
                        choices=["max", "min"],
                        help="whether higher (max) or lower (min) is better")
    parser.add_argument(
        "--early_stop", type=int, default=0, metavar="PATIENCE",
        help="with --keep_best: stop training after PATIENCE consecutive "
             "evals without improvement on the --keep_best metric (the "
             "Keras EarlyStopping analogue; the best checkpoint is already "
             "in <workdir>/best when it fires)",
    )
    parser.add_argument(
        "--model_parallel", type=int, default=1, metavar="N",
        help="size of the mesh 'model' axis (Megatron TP degree); required "
             ">= 2 when the model config sets tensor_parallel",
    )
    parser.add_argument(
        "--dcn_slices", type=int, default=1, metavar="N",
        help="multi-slice deployment: lay the data axis out slice-major so "
             "gradient all-reduces decompose into per-slice ICI collectives "
             "plus one small DCN exchange (parallel/mesh.py)",
    )
    parser.add_argument(
        "--profile_steps", type=int, default=0, metavar="N",
        help="capture a jax.profiler trace of N steady-state training steps "
             "to <workdir>/trace (after a short warmup so compiles stay out "
             "of the trace; view with tensorboard/perfetto — SURVEY.md §5 "
             "tracing)",
    )
    parser.add_argument(
        "--auto_restart", type=int, default=0, metavar="N",
        help="on a device stall, re-exec this command up to N times and "
             "resume from the latest checkpoint (the observed remote-backend "
             "hang recovers on process restart; safe because this CLI is "
             "resume-idempotent)",
    )
    parser.add_argument(
        "--max_seconds", type=float, default=0, metavar="S",
        help="time-budget training: after S seconds, finish the in-flight "
             "step, checkpoint the current step, and exit 0 (same clean-stop "
             "path as SIGTERM preemption; re-invoke to continue toward "
             "--steps)",
    )
    parser.add_argument(
        "--coordinator", default=None,
        help="multi-process training: coordinator host:port — launch one "
             "process per host with identical args plus --process_id; "
             "requires --num_processes (SURVEY.md §5 comm backend)",
    )
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args, overrides = parser.parse_known_args(argv)

    if args.keep_best and args.eval_every <= 0:
        parser.error("--keep_best requires --eval_every (the best checkpoint "
                     "is selected by the eval metric)")
    if args.eval_images > 0 and (args.eval_every <= 0 or not args.tensorboard):
        parser.error("--eval_images requires --eval_every and --tensorboard "
                     "(images land in the TB events file)")
    if args.early_stop > 0 and not args.keep_best:
        parser.error("--early_stop requires --keep_best (it defines the "
                     "watched metric and direction)")
    if args.coordinator is not None and (
            args.num_processes is None or args.process_id is None):
        # Passing None into jax.distributed.initialize yields an opaque
        # backend error (or unintended env auto-detection) — fail at the
        # CLI boundary instead (ADVICE r3).
        parser.error("--coordinator requires --num_processes and --process_id")

    if args.coordinator is not None:
        # DCN side of the comm backend: one controller per host, global mesh
        # over every host's devices, GSPMD collectives ride ICI within a host
        # and DCN across. Must run before any other jax API touches devices.
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    if args.debug_nans:
        import jax as _jax

        _jax.config.update("jax_debug_nans", True)

    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model(args.model)
    cfg = spec.params_cls.from_cli(overrides)

    mesh = None
    if args.model_parallel > 1 or args.dcn_slices > 1:
        from cvm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model_axis=args.model_parallel,
                         dcn_slices=args.dcn_slices)
    if getattr(cfg, "tensor_parallel", False) and args.model_parallel < 2:
        # Without a real model axis the Megatron rules shard over a size-1
        # axis — silently a no-op. Fail at the CLI boundary.
        parser.error("--tensor_parallel true requires --model_parallel >= 2 "
                     "(the mesh 'model' axis the TP rules shard over)")

    if args.pad_hw:
        from cvm_tpu.utils.config import parse_hw

        pad_hw = parse_hw(args.pad_hw, "--pad_hw")
    else:
        pad_hw = (int(cfg.input_hw[0] * 1.5), int(cfg.input_hw[1] * 1.5))

    # Checkpoint saves are collective (every process participates; Orbax
    # coordinates the write), but scalar logs are host files — process 0 only.
    is_proc0 = jax.process_index() == 0
    trainer = Trainer(
        spec,
        cfg,
        mesh=mesh,
        checkpoint_dir=f"{args.workdir}/checkpoints",
        metrics_path=f"{args.workdir}/metrics.jsonl" if is_proc0 else None,
        tensorboard_dir=f"{args.workdir}/tb" if (args.tensorboard and is_proc0) else None,
        checkpoint_every=args.checkpoint_every,
        log_every=args.log_every,
        seed=args.seed,
        # Use the explicit argv when given — a programmatic caller's restart
        # must re-exec the TRAINING command, not the host process's command
        # line (ADVICE r3).
        restart_argv=([sys.executable, "-m", "cvm_tpu.cli.train"]
                      + list(argv if argv is not None else sys.argv[1:])
                      if args.auto_restart > 0 else None),
        max_restarts=args.auto_restart,
    )

    # Preemption-safe SIGTERM: schedulers preempt TPU jobs with SIGTERM and
    # a grace window. Finish the in-flight step, checkpoint the current step
    # (Trainer.fit handles both), and exit 0 — a restarted job resumes from
    # that exact step instead of the last --checkpoint_every multiple.
    import signal

    def _on_sigterm(signum, frame):
        trainer.request_stop()
        print("[cvm_tpu] SIGTERM: checkpointing current step, then exiting "
              "cleanly (resume with the same --workdir)",
              file=sys.stderr, flush=True)

    signal.signal(signal.SIGTERM, _on_sigterm)

    if args.max_seconds > 0:
        # Time-budget training (preemptible quota, batch-queue wall clocks):
        # same clean-stop path as SIGTERM, driven by a daemon timer.
        import threading

        def _budget():
            trainer.request_stop()
            print(f"[cvm_tpu] --max_seconds {args.max_seconds:g} reached: "
                  "checkpointing current step, then exiting cleanly",
                  file=sys.stderr, flush=True)

        _timer = threading.Timer(args.max_seconds, _budget)
        _timer.daemon = True  # never keep a finished run alive
        _timer.start()

    # cfg.batch_size is the GLOBAL batch; each process hosts its own slice
    # (assembled into the global array by parallel.mesh.global_put).
    if cfg.batch_size % jax.process_count():
        parser.error(f"batch_size {cfg.batch_size} not divisible by "
                     f"{jax.process_count()} processes")
    local_bs = cfg.batch_size // jax.process_count()

    if args.data == "synthetic":
        from cvm_tpu.data.synthetic import synthetic_iterator

        nc = getattr(cfg, "num_classes", getattr(cfg, "num_det_classes", 3))
        it = synthetic_iterator(
            args.seed + jax.process_index() * 7919, local_bs, pad_hw,
            num_classes=min(nc, 10),
            two_frame=(args.model == "dmds"),
            with_3d=getattr(cfg, "with_3d", False),
        )
    else:
        from cvm_tpu.data.loader import RecordLoader
        from cvm_tpu.data.records import RecordDataset

        ds = RecordDataset([p for p in args.data.split(",") if p])
        # Multi-host: each process reads its own stride of the train ids.
        train_ids, _ = ds.split_ids(
            shard_index=jax.process_index(), num_shards=jax.process_count()
        )
        # Scale-aware decode: never decode pixels the letterbox will discard
        # (power-of-2 DCT scale covering ~1.3x the model input, leaving
        # headroom for scale/shift augmentation).
        target_hw = (0, 0)
        if args.decode_target == "auto":
            target_hw = (int(cfg.input_hw[0] * 1.3), int(cfg.input_hw[1] * 1.3))
        elif args.decode_target not in ("off", None):
            from cvm_tpu.utils.config import parse_hw

            target_hw = parse_hw(args.decode_target, "--decode_target")
        loader = RecordLoader(
            ds, local_bs, pad_hw, ids=train_ids,
            max_objects=getattr(cfg, "max_objects", 128), seed=args.seed,
            target_hw=target_hw,
        )
        it = iter(loader)

    sample = next(it)
    trainer.init_state(sample)
    start_step = int(trainer.state.step)
    print(f"[cvm_tpu] model={args.model} devices={jax.device_count()} "
          f"start_step={start_step}", flush=True)
    if start_step > 0 and args.steps > 0:
        # --steps is the TOTAL target: a resumed process (auto-restart
        # re-exec, persistent flagship relaunch, manual re-invocation) trains
        # only the remainder instead of overshooting by another full budget.
        args.steps = max(0, args.steps - start_step)
        print(f"[cvm_tpu] resume: {args.steps} of the --steps total remain",
              flush=True)

    best = None
    if args.keep_best:
        from cvm_tpu.train.checkpoints import BestCheckpoint

        best = BestCheckpoint(f"{args.workdir}/best", args.keep_best,
                              args.keep_best_mode, params_cfg=cfg)

    def run_eval():
        from cvm_tpu.train.evaluate import evaluate_model

        if args.data == "synthetic":
            from cvm_tpu.data.synthetic import synthetic_batch
            import numpy as _np

            _rng = _np.random.default_rng(999)
            val = [
                synthetic_batch(_rng, cfg.batch_size, pad_hw, num_classes=min(nc, 10),
                                two_frame=(args.model == "dmds"),
                                with_3d=getattr(cfg, "with_3d", False))
                for _ in range(args.eval_batches)
            ]
        else:
            from cvm_tpu.data.loader import RecordLoader as _RL

            _, val_ids = ds.split_ids()
            val = _RL(ds, cfg.batch_size, pad_hw, ids=val_ids, shuffle=False,
                      loop=False, max_objects=getattr(cfg, "max_objects", 128))
        variables = {"params": trainer.eval_params, "batch_stats": trainer.state.batch_stats}
        m = evaluate_model(spec, cfg, variables, val, max_batches=args.eval_batches,
                           mesh=trainer.mesh)
        print(f"[cvm_tpu] eval@{int(trainer.state.step)}: {m}", flush=True)
        if trainer.metrics_writer is not None:
            trainer.metrics_writer.write(int(trainer.state.step), {f"val_{k}": v for k, v in m.items()})
        if best is not None:
            if args.keep_best not in m:
                print(f"[cvm_tpu] --keep_best {args.keep_best!r} not in eval "
                      f"metrics {sorted(m)} — no best checkpoint recorded",
                      file=sys.stderr, flush=True)
            elif best.update(int(trainer.state.step), trainer.state,
                             m[args.keep_best]):
                print(f"[cvm_tpu] new best {args.keep_best}="
                      f"{m[args.keep_best]:.4f} @step {int(trainer.state.step)}"
                      f" -> {args.workdir}/best", flush=True)
        if args.eval_images > 0 and is_proc0:
            log_eval_images(val, variables)
        return m

    _pipe_cache = {}

    def log_eval_images(val, variables):
        """Render eval-sample predictions into the TB Images tab — the
        headless analogue of the reference's OpenCV inspection windows."""
        import numpy as _np

        from cvm_tpu.infer.pipeline import InferencePipeline
        from cvm_tpu.infer.visualize import render_sample

        try:
            batch0 = val[0] if isinstance(val, list) else next(iter(val))
        except StopIteration:
            # evaluate_model drained the record loader completely.
            print("[cvm_tpu] --eval_images: eval loader exhausted — "
                  "skipping image summaries", file=sys.stderr, flush=True)
            return
        if "image" not in batch0:
            print("[cvm_tpu] --eval_images: batch has no 'image' plane "
                  "(raw-YUV shards) — skipping image summaries",
                  file=sys.stderr, flush=True)
            return
        pipe = _pipe_cache.get("pipe")
        if pipe is None:
            # Built once; weights swap per eval (variables are a jit arg,
            # so later evals reuse the compiled program).
            pipe = InferencePipeline(spec, cfg, variables, mesh=trainer.mesh)
            _pipe_cache["pipe"] = pipe
        else:
            pipe.update_variables(variables)
        out = pipe(batch0)
        step = int(trainer.state.step)
        n = min(args.eval_images, int(batch0["image"].shape[0]))
        for i in range(n):
            vis = {k: _np.asarray(v[i]) for k, v in out.items()}
            if "centers3d" in out and "intrinsics" in batch0:
                vis["intrinsics"] = _np.asarray(batch0["intrinsics"][i])
            rgb = render_sample(None, batch0["image"][i],
                                batch0["image_hw"][i], vis)
            trainer.metrics_writer.write_image(step, f"eval/sample_{i}", rgb)
        print(f"[cvm_tpu] wrote {n} eval image summaries @step {step}",
              flush=True)

    nc = getattr(cfg, "num_classes", getattr(cfg, "num_det_classes", 3))
    metrics = {}
    if args.profile_steps > 0 and args.steps > 0:
        from cvm_tpu.utils.prof import trace

        # Warm up past compiles so the trace shows steady-state steps only.
        warm = min(20, max(args.steps - args.profile_steps, 0))
        if warm:
            trainer.fit(it, warm)
        n = min(args.profile_steps, args.steps - warm)
        trace_dir = f"{args.workdir}/trace"
        with trace(trace_dir):
            metrics = trainer.fit(it, n)
        args.steps -= warm + n
        print(f"[cvm_tpu] profiler trace of {n} steps written to {trace_dir}",
              flush=True)
    if args.eval_every > 0 and jax.process_count() > 1:
        # evaluate_model jits its own per-host program; running it inside a
        # multi-controller job would deadlock the global-mesh collectives.
        # Evaluate post-hoc from a checkpoint (cli.evaluate) instead.
        print("[cvm_tpu] --eval_every disabled under multi-process training; "
              "run cli.evaluate on a checkpoint", file=sys.stderr, flush=True)
        args.eval_every = 0
    if args.eval_every > 0:
        remaining = args.steps
        if remaining == 0 and start_step > 0:
            # Resumed past the step target (e.g. killed between the final fit
            # and its eval): ensure the final eval — and the --keep_best
            # checkpoint it selects — still exists.
            run_eval()
        stopper = None
        if args.early_stop > 0:
            from cvm_tpu.train.early_stop import EarlyStopper

            stopper = EarlyStopper(args.keep_best, args.early_stop,
                                   args.keep_best_mode)
        while remaining > 0:
            chunk = min(args.eval_every, remaining)
            metrics = trainer.fit(it, chunk)
            if trainer.stop_requested:
                break  # preempted: skip the eval, the grace window is short
            m = run_eval()
            remaining -= chunk
            if stopper is not None and stopper.update(m):
                print(f"[cvm_tpu] early stop @step {int(trainer.state.step)}: "
                      f"{args.keep_best} has not improved past "
                      f"{stopper.best:.4f} for {args.early_stop} evals "
                      f"(best checkpoint is in {args.workdir}/best)",
                      flush=True)
                break
    elif args.steps > 0:
        metrics = trainer.fit(it, args.steps)
    if args.data != "synthetic" and hasattr(loader, "stats"):
        # Per-stage input-pipeline timing (read/decode/assemble ms per
        # batch): compare decode against the device step to spot a
        # host-decode-bound run at a glance.
        print(f"[cvm_tpu] input pipeline: {loader.stats()}", flush=True)
    if best is not None:
        best.wait()  # async Orbax write must commit before the process exits
    if trainer.stop_requested:
        print(f"[cvm_tpu] preempted at step {int(trainer.state.step)}: "
              f"checkpoint committed, exiting cleanly", flush=True)
        return 0
    print(f"[cvm_tpu] done: {metrics}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
