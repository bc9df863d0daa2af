from cvm_tpu.train.loop import Trainer, TrainState, make_train_step  # noqa: F401
