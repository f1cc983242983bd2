"""Dice loss / region metrics vs closed-form cases (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.train import loss as L
from brats2019_tpu.train import metrics as M


def test_perfect_prediction_zero_dice_loss():
    labels = np.zeros((1, 4, 4, 4), dtype=np.int32)
    labels[0, :2] = 1
    labels[0, 2, 2, 2] = 2
    logits = jax.nn.one_hot(labels, 4) * 100.0  # ~deterministic softmax
    d = float(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert d < 1e-3


def test_dice_loss_worst_case():
    labels = np.ones((1, 4, 4, 4), dtype=np.int32)
    wrong = np.full_like(labels, 2)
    logits = jax.nn.one_hot(wrong, 4) * 100.0
    d = float(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert d > 0.6  # classes 1 and 2 fully wrong; class 3 empty-empty

def test_ce_matches_closed_form():
    labels = np.array([[[[0]]]], dtype=np.int32)
    logits = np.zeros((1, 1, 1, 1, 4), dtype=np.float32)
    ce = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ce, np.log(4.0), rtol=1e-5)


def test_segmentation_loss_aux():
    labels = np.zeros((2, 4, 4, 4), dtype=np.int32)
    logits = np.zeros((2, 4, 4, 4, 4), dtype=np.float32)
    loss, aux = L.segmentation_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert set(aux) == {"loss", "dice_loss", "ce_loss"}
    assert float(loss) == float(aux["loss"])


def test_region_dice_known_overlap():
    gt = np.zeros((8, 8, 8), dtype=np.int32)
    gt[:4] = 3  # ET block of 256 voxels
    pred = np.zeros_like(gt)
    pred[:2] = 3  # half of it
    d_np = M.region_dice_np(pred, gt)
    # dice = 2*128 / (128+256)
    np.testing.assert_allclose(d_np["ET"], 2 * 128 / 384, rtol=1e-5)
    np.testing.assert_allclose(d_np["WT"], 2 * 128 / 384, rtol=1e-5)
    d_j = {k: float(v) for k, v in M.region_dice(jnp.asarray(pred), jnp.asarray(gt)).items()}
    for k in d_np:
        np.testing.assert_allclose(d_j[k], d_np[k], rtol=1e-4)


def test_region_dice_empty_empty_is_one():
    gt = np.zeros((4, 4, 4), dtype=np.int32)
    pred = np.zeros_like(gt)
    d = M.region_dice_np(pred, gt)
    assert d == {"WT": 1.0, "TC": 1.0, "ET": 1.0}


def test_region_semantics():
    # label 1 (NCR) counts toward WT and TC but not ET; label 2 only WT
    gt = np.zeros((4, 4, 4), dtype=np.int32)
    gt[0] = 1
    gt[1] = 2
    pred = gt.copy()
    d = M.region_dice_np(pred, gt)
    assert d["WT"] == 1.0 and d["TC"] == 1.0 and d["ET"] == 1.0


def test_lowres_loss_matches_fullres():
    """segmentation_loss_lowres on the pre-d2s head output must equal the
    full-res loss (same math, block-reorganized reductions)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from brats2019_tpu.models import UNet3D
    from brats2019_tpu.models.unet3d import UNetConfig
    from brats2019_tpu.train.loss import segmentation_loss, segmentation_loss_lowres

    cfg = UNetConfig(levels=2, base_features=4, compute_dtype="float32",
                     stem_downsample=2)
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16, 4))
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16, 16), 0, 4)
    params = model.init(jax.random.PRNGKey(2), x)
    full, aux_f = segmentation_loss(model.apply(params, x), y,
                                    region_weight=0.5)
    low, aux_l = segmentation_loss_lowres(
        model.apply(params, x, subpixel=False), y, 2, region_weight=0.5,
    )
    np.testing.assert_allclose(float(full), float(low), rtol=1e-5)
    np.testing.assert_allclose(float(aux_f["dice_loss"]),
                               float(aux_l["dice_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(aux_f["region_dice_loss"]),
                               float(aux_l["region_dice_loss"]), rtol=1e-5)


# --- Hausdorff95 (BraTS's second official metric) ----------------------------


def test_hd95_identical_masks_is_zero():
    m = np.zeros((12, 12, 12), bool)
    m[3:8, 3:8, 3:8] = True
    assert M.hd95_np(m, m) == 0.0


def test_hd95_known_offset():
    # two parallel 1-voxel-thick plates k voxels apart: every surface voxel
    # of one is exactly k from the other -> HD95 == k
    a = np.zeros((20, 8, 8), bool)
    b = np.zeros((20, 8, 8), bool)
    a[5, :, :] = True
    b[9, :, :] = True
    assert M.hd95_np(a, b) == 4.0
    # anisotropic spacing scales the axis
    assert M.hd95_np(a, b, spacing=(2.0, 1.0, 1.0)) == 8.0


def test_hd95_asymmetric_takes_max_direction():
    # b == a plus a far blob covering >5% of b's surface: a->b distances
    # stay 0, b->a picks up the blob, and the symmetric max must see it.
    # (A single far voxel must NOT register — that is the 95th-percentile
    # robustness HD95 exists for; checked below.)
    a = np.zeros((30, 8, 8), bool)
    a[2:6, 2:6, 2:6] = True
    b = a.copy()
    b[24:27, 2:5, 2:5] = True  # 27 voxels vs the cube's 56 surface voxels
    assert M.hd95_np(a, b) > 15.0
    b1 = a.copy()
    b1[25, 3, 3] = True  # 1 of 57 surface voxels -> inside the 5% tail
    assert M.hd95_np(a, b1) == 0.0


def test_hd95_empty_conventions():
    empty = np.zeros((8, 8, 8), bool)
    full = np.zeros((8, 8, 8), bool)
    full[2:5, 2:5, 2:5] = True
    assert M.hd95_np(empty, empty) == 0.0
    assert np.isinf(M.hd95_np(empty, full))
    assert np.isinf(M.hd95_np(full, empty))


def test_region_hd95_matches_manual_masks():
    pred = np.zeros((16, 16, 16), np.int32)
    gt = np.zeros((16, 16, 16), np.int32)
    pred[4:8, 4:8, 4:8] = 3  # ET cube
    gt[4:8, 4:8, 4:8] = 3
    gt[10:12, 4:8, 4:8] = 2  # extra edema only in gt -> WT differs
    out = M.region_hd95_np(pred, gt)
    assert out["ET"] == 0.0 and out["TC"] == 0.0
    manual = M.hd95_np(pred > 0, gt > 0)
    assert out["WT"] == manual and out["WT"] > 0.0


def test_hd95_bbox_restriction_is_exact():
    # same masks placed in a big volume vs a tight one: identical distances
    a_s = np.zeros((14, 14, 14), bool); a_s[3:6, 3:6, 3:6] = True
    b_s = np.zeros((14, 14, 14), bool); b_s[7:10, 3:6, 3:6] = True
    a_big = np.zeros((64, 64, 64), bool); a_big[33:36, 33:36, 33:36] = True
    b_big = np.zeros((64, 64, 64), bool); b_big[37:40, 33:36, 33:36] = True
    assert M.hd95_np(a_s, b_s) == M.hd95_np(a_big, b_big)


def test_region_sens_spec_known_counts():
    pred = np.zeros((10, 10, 10), np.int32)
    gt = np.zeros((10, 10, 10), np.int32)
    gt[0:4, 0:5, 0:5] = 1    # 100 positive WT voxels
    pred[0:2, 0:5, 0:5] = 1  # covers 50 of them, no false positives
    out = M.region_sens_spec_np(pred, gt)
    assert out["Sens_WT"] == 0.5
    assert out["Spec_WT"] == 1.0
    # ET empty in both: sensitivity convention 1.0, specificity exact
    assert out["Sens_ET"] == 1.0 and out["Spec_ET"] == 1.0


def test_region_sens_spec_false_positives_hit_specificity():
    pred = np.zeros((10, 10, 10), np.int32)
    gt = np.zeros((10, 10, 10), np.int32)
    pred[0:5, 0:5, 0:4] = 3  # 100 FP ET voxels, 1000 total
    out = M.region_sens_spec_np(pred, gt)
    assert out["Sens_ET"] == 1.0       # no positives to miss
    assert out["Spec_ET"] == 0.9       # 900/1000 true negatives
