from cvm_tpu.models.centernet.params import CenternetParams  # noqa: F401
from cvm_tpu.models.centernet.model import create_model  # noqa: F401
from cvm_tpu.models.centernet.loss import centernet_loss  # noqa: F401
