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
