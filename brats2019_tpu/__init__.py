"""brats2019_tpu — a TPU-native volumetric segmentation framework.

A from-scratch rebuild of the capability surface of the public
``lachinov/brats2019`` repository (cascaded two-stage 3D U-Net for BraTS 2019
brain-tumor segmentation), redesigned TPU-first:

* compute path: jax / XLA conv3d / Pallas fused kernels
* parallelism: ``jax.sharding.Mesh`` + jit shardings, XLA collectives over ICI
* data path:   pure-NumPy NIfTI-1 ingest (optionally C++-accelerated gzip
  decode), on-device fused preprocessing + augmentation graph
* entry points mirror the reference CLI: ``train`` and ``predict <case_dir>``

Reference parity map lives in SURVEY.md at the repo root; component numbers
(C1..C18, N1..N4) cited in docstrings refer to SURVEY.md §2.
"""

__version__ = "0.1.0"
