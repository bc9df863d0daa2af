from cvm_tpu.models.depth.params import DepthParams  # noqa: F401
from cvm_tpu.models.depth.model import create_model  # noqa: F401
from cvm_tpu.models.depth.loss import depth_loss  # noqa: F401
