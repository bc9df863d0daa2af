"""Device-side image ops, ground-truth renderers and decoders.

All ops are pure jnp functions with static output shapes (jit/pjit friendly).
Reference-capability notes cite the survey blueprint (SURVEY.md §2) because the
reference mount was empty at build time (SURVEY.md §0).
"""

from cvm_tpu.ops.image import (  # noqa: F401
    Roi,
    letterbox_roi,
    sample_bilinear,
    sample_nearest,
    letterbox,
    normalize_imagenet,
    normalize_pm1,
    map_points_to_output,
    map_boxes_to_output,
)
from cvm_tpu.ops.heatmap import (  # noqa: F401
    gaussian_radius,
    render_centernet_targets,
)
from cvm_tpu.ops.decode import (  # noqa: F401
    decode_centernet,
    decode_centernet_3d,
    decode_centernet_with_extras,
    semseg_argmax,
    colorize_semseg,
    upsample_bilinear,
)
from cvm_tpu.ops.image import chroma_roi, yuv_to_rgb  # noqa: F401
from cvm_tpu.ops.ssim import ssim  # noqa: F401
from cvm_tpu.ops.warp import (  # noqa: F401
    bilinear_sample,
    bilinear_sample_mxu,
    euler_to_matrix,
    scale_intrinsics,
    warp_frame,
)
