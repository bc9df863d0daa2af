from cvm_tpu.models.dmds.params import DmdsParams  # noqa: F401
from cvm_tpu.models.dmds.model import create_model  # noqa: F401
from cvm_tpu.models.dmds.loss import dmds_loss  # noqa: F401
