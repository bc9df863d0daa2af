"""Child process for the kill/restart fault-injection test.

Trains a tiny model with an async checkpoint dispatched EVERY step and never
calls wait() — so a SIGKILL from the parent lands while an Orbax write is in
flight with high probability. Prints one "STEP <n>" line per completed step
(flushed) so the parent can time the kill. See tests/test_fault_injection.py.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
# The three child processes compile an identical program; the persistent
# cache turns runs 2..n's compile into a disk read.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cvm_tpu.data.synthetic import synthetic_iterator  # noqa: E402
from cvm_tpu.models import get_model  # noqa: E402
from cvm_tpu.train.loop import Trainer  # noqa: E402


def main(ckdir: str, max_steps: int = 50) -> int:
    spec = get_model("semseg")
    p = spec.params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    trainer = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1,
                      log_every=10_000)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    trainer.init_state(next(it))
    start = int(trainer.state.step)
    print(f"RESUMED {start}", flush=True)
    for _ in range(max_steps):
        trainer.fit(it, 1)
        # Deliberately no ckpt.wait(): the async save races the parent's kill.
        print(f"STEP {int(trainer.state.step)}", flush=True)
    trainer.ckpt.wait()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
