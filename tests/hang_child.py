"""Child process for the device-hang auto-restart fault-injection test.

Simulates the observed backend failure mode (an RPC that never returns,
CLAUDE.md "futex wait, RPC never returned"): on the FIRST run
(CVM_RESTART_COUNT unset/0) the train step blocks forever once 3 steps have
completed. The Trainer's stall watchdog must detect the device-side stall and
re-exec this script (restart_argv); the restarted process resumes from the
latest checkpoint and runs to completion. See tests/test_fault_injection.py.
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cvm_tpu.data.synthetic import synthetic_iterator  # noqa: E402
from cvm_tpu.models import get_model  # noqa: E402
from cvm_tpu.train.loop import Trainer  # noqa: E402


def main(ckdir: str, total_steps: int = 8) -> int:
    spec = get_model("semseg")
    p = spec.params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    trainer = Trainer(
        spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1,
        restart_argv=[sys.executable, os.path.abspath(__file__), ckdir,
                      str(total_steps)],
        max_restarts=2,
    )

    first_run = int(os.environ.get("CVM_RESTART_COUNT", "0")) == 0
    real_step = trainer.train_step
    calls = [0]

    def hanging_step(state, raw, key):
        calls[0] += 1
        if first_run and calls[0] > 3:
            # The dispatch itself never returns — indistinguishable from the
            # real failure as seen by the fit loop (blocked inside a step,
            # input available).
            print("HANGING", flush=True)
            time.sleep(3600)
        return real_step(state, raw, key)

    trainer.train_step = hanging_step

    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    trainer.init_state(next(it))
    start = int(trainer.state.step)
    print(f"RESUMED {start}", flush=True)
    remaining = max(0, total_steps - start)
    trainer.fit(it, remaining)
    trainer.ckpt.wait()
    print(f"DONE {int(trainer.state.step)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8))
