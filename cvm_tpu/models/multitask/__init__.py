from cvm_tpu.models.multitask.params import MultitaskParams  # noqa: F401
from cvm_tpu.models.multitask.model import create_model  # noqa: F401
from cvm_tpu.models.multitask.loss import multitask_loss  # noqa: F401
