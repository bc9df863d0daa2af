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
    semseg_argmax,
    colorize_semseg,
)
