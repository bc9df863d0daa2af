from cvm_tpu.models.semseg.params import SemsegParams  # noqa: F401
from cvm_tpu.models.semseg.model import create_model  # noqa: F401
from cvm_tpu.models.semseg.loss import semseg_loss  # noqa: F401
