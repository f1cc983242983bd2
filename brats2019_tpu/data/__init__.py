from .case import Case, discover_cases, load_case  # noqa: F401
from .constants import (  # noqa: F401
    MODALITIES,
    NUM_CLASSES,
    NUM_MODALITIES,
    VOLUME_SHAPE,
    disk_to_internal,
    internal_to_disk,
)
