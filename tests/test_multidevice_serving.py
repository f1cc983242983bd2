"""Multi-device serving: volumes striped across local devices must give the
same results as single-volume prediction (SURVEY.md §2.2 DP inference)."""

import jax
import numpy as np
import pytest

from brats2019_tpu.configs.presets import (
    ExperimentConfig,
    InferenceConfig,
    TrainConfig,
)
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D, UNetConfig

UCFG = UNetConfig(levels=2, base_features=4, compute_dtype="float32")


def test_striped_many_matches_single():
    assert len(jax.local_devices()) == 8  # virtual CPU mesh
    exp = ExperimentConfig(
        name="t",
        unet=UCFG,
        coarse_unet=None,
        train=TrainConfig(pool_shape=(32, 32, 32)),
        infer=InferenceConfig(
            canvas=None, tile=(16, 16, 16), cascade=False, tta_flips=False,
            min_component_voxels=0, et_min_voxels=0, compute_dtype="float32",
        ),
    )
    model = UNet3D(UCFG)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 16, 16, 16, 4)))
    pred = Predictor(exp, params)
    images = [make_case_arrays(seed=i, shape=(36, 32, 28))[0] for i in range(5)]
    many = pred.predict_arrays_many(images)
    assert len(many) == 5
    for img, got in zip(images, many):
        single, _ = pred.predict_arrays(img)
        np.testing.assert_array_equal(got, single)


def test_striped_many_matches_single_split_tta():
    """Same striping contract through the SPLIT flagship path (cascade,
    roi == tile, 8-flip TTA — three chained programs per volume; the jit
    caches must handle per-device placements)."""
    exp = ExperimentConfig(
        name="t_split",
        unet=UCFG,
        coarse_unet=UCFG,
        train=TrainConfig(pool_shape=(32, 32, 32)),
        infer=InferenceConfig(
            canvas=None, tile=(16, 16, 16), cascade=True, tta_flips=True,
            coarse_shape=(16, 16, 16), roi_shape=(16, 16, 16),
            min_component_voxels=0, et_min_voxels=0, compute_dtype="float32",
            tta_precision="float32",
        ),
    )
    model = UNet3D(UCFG)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 16, 16, 16, 4)))
    coarse = model.init(jax.random.PRNGKey(1), np.zeros((1, 16, 16, 16, 4)))
    pred = Predictor(exp, params, coarse)
    assert hasattr(pred._fn, "stages")  # split path engaged
    images = [make_case_arrays(seed=i, shape=(36, 32, 28))[0] for i in range(5)]
    many = pred.predict_arrays_many(images)
    for img, got in zip(images, many):
        single, _ = pred.predict_arrays(img)
        np.testing.assert_array_equal(got, single)
