"""Native fast loader vs pure-python reader (SURVEY.md C6 native path)."""

import numpy as np
import pytest

from brats2019_tpu.data import synthetic
from brats2019_tpu.data.case import load_case, modality_paths
from brats2019_tpu.data.preprocess import brain_bbox_np
from brats2019_tpu.utils import nifti_fast


pytestmark = pytest.mark.skipif(
    not nifti_fast.available(), reason="libfastnifti.so not built"
)


@pytest.fixture(scope="module")
def case_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastnifti")
    return synthetic.write_case(str(root / "BraTS19_F_1"), shape=(48, 40, 32))


def test_matches_python_reader(case_dir):
    paths = modality_paths(case_dir)
    res = nifti_fast.load_volumes_fast(paths)
    assert res is not None
    fast, meta = res
    ref = load_case(case_dir, load_seg=False).image
    assert fast.shape == ref.shape
    np.testing.assert_allclose(fast, ref, atol=1e-4)


def test_stats_and_bbox_match(case_dir):
    paths = modality_paths(case_dir)
    fast, meta = nifti_fast.load_volumes_fast(paths)
    for c in range(4):
        vals = fast[..., c][fast[..., c] != 0]
        np.testing.assert_allclose(meta["mean"][c], vals.mean(), rtol=1e-5)
        np.testing.assert_allclose(meta["std"][c], vals.std(), rtol=1e-4)
    bbox = brain_bbox_np(fast)
    np.testing.assert_array_equal(meta["bbox_lo"], bbox.lo)
    np.testing.assert_array_equal(meta["bbox_hi"], bbox.hi)
