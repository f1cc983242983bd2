"""BraTS 2019 dataset constants (SURVEY.md [B] facts).

Label semantics (BraTS challenge convention):
  0 = background
  1 = necrotic / non-enhancing tumor core (NCR/NET)
  2 = peritumoral edema (ED)
  4 = GD-enhancing tumor (ET)     <- note: 3 is unused on disk

Internally we use contiguous classes {0,1,2,3} with 3 <-> disk label 4
(SURVEY.md C16 "remap internal class 3 -> BraTS label 4").

Evaluation regions (SURVEY.md C11):
  WT (whole tumor)    = {1, 2, 4}
  TC (tumor core)     = {1, 4}
  ET (enhancing)      = {4}
"""

MODALITIES = ("t1", "t1ce", "t2", "flair")
NUM_MODALITIES = 4
NUM_CLASSES = 4  # internal contiguous: bg, NCR/NET, ED, ET

VOLUME_SHAPE = (240, 240, 155)  # canonical BraTS volume (x, y, z)

# disk label <-> internal class
DISK_LABELS = (0, 1, 2, 4)


def internal_to_disk(labels):
    """Map internal class ids {0,1,2,3} -> BraTS disk labels {0,1,2,4}."""
    import numpy as np

    out = np.asarray(labels).copy()
    out[out == 3] = 4
    return out


def disk_to_internal(labels):
    """Map BraTS disk labels {0,1,2,4} -> internal contiguous {0,1,2,3}."""
    import numpy as np

    out = np.asarray(labels).copy()
    out[out == 4] = 3
    return out
