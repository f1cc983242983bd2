from .norm import instance_norm_act  # noqa: F401
from .resize import resize_trilinear, downsample2x, upsample2x  # noqa: F401
