"""Sliding-window tiling, blending, TTA, cascade predict (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.configs.presets import (
    ExperimentConfig,
    InferenceConfig,
    TrainConfig,
)
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.infer import tiling, tta
from brats2019_tpu.infer.postprocess import (
    filter_small_components_np,
    postprocess_labels,
    suppress_tiny_et_np,
)
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D, UNetConfig


# ---------------------------------------------------------------- tiling --

def test_tile_origins_cover_volume():
    origins = tiling.tile_origins((64, 48, 32), (32, 32, 32), overlap=0.5)
    covered = np.zeros((64, 48, 32), dtype=bool)
    for o in origins:
        covered[o[0] : o[0] + 32, o[1] : o[1] + 32, o[2] : o[2] + 32] = True
    assert covered.all()
    # flush final tile present on the long axis
    assert (origins[:, 0] == 32).any()


def test_tile_origins_tile_bigger_than_volume():
    origins = tiling.tile_origins((16, 16, 16), (32, 32, 32))
    np.testing.assert_array_equal(origins, [[0, 0, 0]])


def test_blend_weight_modes():
    g = tiling.blend_weight((8, 8, 8), "gaussian", 0.125)
    assert g.shape == (8, 8, 8, 1)
    assert g.max() == 1.0
    center = g[3:5, 3:5, 3:5].min()
    assert center > g[0, 0, 0, 0]
    u = tiling.blend_weight((8, 8, 8), "softmax")
    assert (u == 1.0).all()


def test_sliding_window_constant_function():
    # a "model" that returns one-hot class 2 everywhere: blending any number
    # of overlapping tiles must still give exactly class 2 with prob 1
    def tile_probs(patch):
        p = jnp.zeros(patch.shape[:3] + (4,), jnp.float32)
        return p.at[..., 2].set(1.0)

    vol = jnp.zeros((24, 16, 16, 4))
    origins = tiling.tile_origins((24, 16, 16), (8, 8, 8), overlap=0.5)
    w = jnp.asarray(tiling.blend_weight((8, 8, 8), "gaussian"))
    probs = tiling.sliding_window_probs(
        tile_probs, vol, origins, (8, 8, 8), w, 4
    )
    np.testing.assert_allclose(np.asarray(probs[..., 2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_sliding_window_position_dependent():
    # model echoes the patch's own intensity -> blended output must
    # reconstruct the volume's channel 0 (weighted average of identical
    # values is the value)
    def tile_probs(patch):
        v = patch[..., :1]
        return jnp.concatenate([v, -v, v * 0 + 1, v * 0], axis=-1)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(24, 16, 8, 4)), jnp.float32)
    origins = tiling.tile_origins((24, 16, 8), (8, 8, 8), overlap=0.5)
    w = jnp.asarray(tiling.blend_weight((8, 8, 8), "gaussian"))
    probs = tiling.sliding_window_probs(tile_probs, x, origins, (8, 8, 8), w, 4)
    np.testing.assert_allclose(
        np.asarray(probs[..., 0]), np.asarray(x[..., 0]), atol=1e-4
    )


# ------------------------------------------------------------------- tta --

def test_flip_volume_roundtrip():
    x = jnp.asarray(np.arange(2 * 3 * 4 * 2).reshape(2, 3, 4, 2), jnp.float32)
    for f in tta.FLIPS:
        y = tta.flip_volume(tta.flip_volume(x, f), f)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_tta_equivariant_model_matches_single():
    # pointwise model (flip-equivariant): TTA mean == single forward
    def apply_fn(params, batch):
        return jnp.stack(
            [batch[..., 0], -batch[..., 0], batch[..., 1], -batch[..., 1]],
            axis=-1,
        )

    tile = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 8, 8, 4)), jnp.float32
    )
    single = tta.tta_probs(apply_fn, None, tile, enabled=False)
    averaged = tta.tta_probs(apply_fn, None, tile, enabled=True)
    np.testing.assert_allclose(np.asarray(single), np.asarray(averaged), atol=1e-5)


# ---------------------------------------------------------- postprocess --

def test_filter_small_components():
    labels = np.zeros((16, 16, 16), dtype=np.uint8)
    labels[2:8, 2:8, 2:8] = 2        # big component (216 voxels)
    labels[12, 12, 12] = 1           # speck
    out = filter_small_components_np(labels, min_voxels=10)
    assert out[12, 12, 12] == 0
    assert (out[2:8, 2:8, 2:8] == 2).all()


def test_suppress_tiny_et():
    labels = np.zeros((8, 8, 8), dtype=np.uint8)
    labels[0, 0, :4] = 3
    out = suppress_tiny_et_np(labels, et_min_voxels=10)
    assert (out[0, 0, :4] == 1).all()
    labels2 = np.zeros((8, 8, 8), dtype=np.uint8)
    labels2[:4, :4, :4] = 3
    out2 = suppress_tiny_et_np(labels2, et_min_voxels=10)
    assert (out2[:4, :4, :4] == 3).all()


# ------------------------------------------------------------- predictor --

UCFG = UNetConfig(levels=2, base_features=4, compute_dtype="float32")


def _make_exp(cascade: bool):
    return ExperimentConfig(
        name="t",
        unet=UCFG,
        coarse_unet=UCFG if cascade else None,
        train=TrainConfig(pool_shape=(32, 32, 32)),
        infer=InferenceConfig(
            canvas=None,
            tile=(16, 16, 16),
            cascade=cascade,
            tta_flips=True,
            coarse_shape=(16, 16, 16),
            roi_shape=(24, 24, 24),
            min_component_voxels=0,
            et_min_voxels=0,
            compute_dtype="float32",
        ),
    )


def _init_params(key=0):
    model = UNet3D(UCFG)
    return model.init(jax.random.PRNGKey(key), jnp.zeros((1, 16, 16, 16, 4)))


@pytest.mark.parametrize("cascade", [False, True])
def test_predictor_end_to_end(cascade):
    exp = _make_exp(cascade)
    params = _init_params()
    coarse = _init_params(1) if cascade else None
    pred = Predictor(exp, params, coarse)
    image, _ = make_case_arrays(seed=5, shape=(40, 36, 28))
    labels, stats = pred.predict_arrays(image)
    assert labels.shape == (40, 36, 28)
    assert labels.dtype == np.uint8
    assert set(np.unique(labels)) <= {0, 1, 2, 3}
    assert stats.total_s > 0
    # background outside the brain must stay 0 (z-score keeps zeros,
    # postprocess/uncrop fill with 0)
    brain = (image != 0).any(-1)
    corner = labels[~brain]
    # untrained net may predict junk inside the canvas region; but strictly
    # outside the bbox everything must be 0
    assert labels[0, 0, 0] == 0 and corner.shape[0] > 0


def test_predict_dir_writes_nifti(tmp_path):
    from brats2019_tpu.data import synthetic
    from brats2019_tpu.utils.nifti import read_nifti

    d = synthetic.write_case(str(tmp_path / "BraTS19_X_1"), shape=(32, 32, 24))
    exp = _make_exp(False)
    pred = Predictor(exp, _init_params())
    out, stats = pred.predict_dir(d)
    seg, hdr = read_nifti(out, apply_scaling=False)
    assert seg.shape == (32, 32, 24)
    assert set(np.unique(seg)) <= {0, 1, 2, 4}  # disk labels


def test_int8_transfer_encoding():
    """int8 transfer: z-score invariance to the per-modality scale (the
    dequantization contract) and the opt-in predictor path."""
    import dataclasses

    from brats2019_tpu.data.preprocess import (
        quantize_int8_per_modality,
        zscore_np,
    )

    image, _ = make_case_arrays(seed=7, shape=(40, 36, 28))
    q = quantize_int8_per_modality(image.astype(np.float32))
    assert q.dtype == np.int8
    # background stays exactly zero; foreground survives
    assert ((image == 0) == (q == 0)).mean() > 0.999
    # z-score absorbs the scale: quantized-then-zscored matches raw zscore
    # up to rounding. One int8 step is (max/127)/std in z units — ~0.12-0.21
    # on these volumes — so worst-case error is ~half a step, RMS far less.
    za = zscore_np(image.astype(np.float32))
    zb = zscore_np(q.astype(np.float32))
    d = np.abs(za - zb)
    assert d.max() < 0.25 and np.sqrt((d**2).mean()) < 0.05

    # predictor opt-in: runs end-to-end, masks near-identical to bf16 path
    exp = _make_exp(False)
    params = _init_params()
    a, _ = Predictor(exp, params).predict_arrays(image)
    exp8 = dataclasses.replace(
        exp, infer=dataclasses.replace(exp.infer, transfer_dtype="int8")
    )
    b, _ = Predictor(exp8, params).predict_arrays(image)
    assert (a == b).mean() > 0.98

    # int8 must also apply on the full-canvas (bucket=0) transfer path
    exp8b0 = dataclasses.replace(
        exp8, infer=dataclasses.replace(exp8.infer, transfer_bucket=0)
    )
    c, _ = Predictor(exp8b0, params).predict_arrays(image)
    np.testing.assert_array_equal(b, c)  # same quantized input either way

    # unknown transfer_dtype fails fast
    import pytest

    bad = dataclasses.replace(
        exp, infer=dataclasses.replace(exp.infer, transfer_dtype="Int8")
    )
    with pytest.raises(ValueError):
        Predictor(bad, params)


def test_split_tta_matches_monolithic():
    """The two-program flagship fast path (flip-stack at a jit boundary;
    PERF.md 'TTA flip layout') must match the monolithic predict program:
    same cascade handoff, same probs up to the skipped blend mul/div."""
    from brats2019_tpu.models.cascade import make_predict_fn

    cfg = InferenceConfig(
        canvas=None,
        tile=(16, 16, 16),
        cascade=True,
        tta_flips=True,
        coarse_shape=(16, 16, 16),
        roi_shape=(16, 16, 16),  # roi == tile, single origin -> split path
        min_component_voxels=0,
        et_min_voxels=0,
        compute_dtype="float32",
        tta_precision="float32",
    )
    model = UNet3D(UCFG)
    apply = lambda p, x: model.apply(p, x)
    pf, pc = _init_params(0), _init_params(1)
    canvas = (32, 32, 32)
    fn_split = make_predict_fn(apply, cfg, canvas, coarse_apply=apply)
    fn_mono = make_predict_fn(
        apply, cfg, canvas, coarse_apply=apply, allow_split=False
    )
    image = jnp.asarray(
        make_case_arrays(seed=11, shape=canvas)[0], jnp.float32
    )
    la, sa = fn_split(pf, pc, image)
    lb, sb = fn_mono(pf, pc, image)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    # identical up to float-tie flips from the skipped (p*w)/w round trip
    assert (np.asarray(la) == np.asarray(lb)).mean() > 0.999


def test_paired_volume_batching_matches_single(tmp_path):
    """batch_volumes=2 (two volumes' fine TTA stages in ONE device program,
    VERDICT round-2 #6) must produce the same labels as the per-volume
    path, including the odd-tail fallback."""
    import dataclasses

    infer = InferenceConfig(
        canvas=None,
        tile=(16, 16, 16),
        cascade=True,
        tta_flips=True,
        coarse_shape=(16, 16, 16),
        roi_shape=(16, 16, 16),  # roi == tile, single origin -> split path
        min_component_voxels=0,
        et_min_voxels=0,
        compute_dtype="float32",
        tta_precision="float32",
    )
    exp = ExperimentConfig(
        name="pair", unet=UCFG, coarse_unet=UCFG,
        train=TrainConfig(pool_shape=(32, 32, 32)), infer=infer,
    )
    pf, pc = _init_params(0), _init_params(1)
    images = [make_case_arrays(seed=s, shape=(32, 32, 32))[0] for s in (3, 4, 5)]

    single = Predictor(exp, pf, pc)
    assert single._pair_dispatcher() is None
    ref = single.predict_arrays_many(images)

    exp2 = dataclasses.replace(
        exp, infer=dataclasses.replace(infer, batch_volumes=2)
    )
    paired = Predictor(exp2, pf, pc)
    assert paired._pair_dispatcher() is not None
    got = paired.predict_arrays_many(images)  # 3 volumes: one pair + tail

    assert len(got) == len(ref) == 3
    for a, b in zip(ref, got):
        # identical math modulo conv-batch reduction-order roundoff; labels
        # must agree essentially everywhere
        assert (np.asarray(a) == np.asarray(b)).mean() > 0.999


def test_split_tta_lowres_reduce_matches_monolithic():
    """The merged fine+low-res-reduce program (stem=2 sub-pixel head;
    PERF.md round 3) must match the monolithic predict program exactly —
    the d2s permutation algebra makes it the same math."""
    from brats2019_tpu.models.cascade import make_predict_fn

    cfg = InferenceConfig(
        canvas=None,
        tile=(16, 16, 16),
        cascade=True,
        tta_flips=True,
        coarse_shape=(16, 16, 16),
        roi_shape=(16, 16, 16),
        min_component_voxels=0,
        et_min_voxels=0,
        compute_dtype="float32",
        tta_precision="float32",
    )
    ucfg2 = UNetConfig(levels=2, base_features=4, compute_dtype="float32",
                       stem_downsample=2)
    fine = UNet3D(ucfg2)
    coarse = UNet3D(UCFG)
    fine_apply = lambda p, x: fine.apply(p, x)
    pf = fine.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    pc = _init_params(1)
    canvas = (32, 32, 32)
    fn_split = make_predict_fn(
        fine_apply, cfg, canvas,
        coarse_apply=lambda p, x: coarse.apply(p, x),
        fine_lowres_apply=lambda p, x: fine.apply(p, x, subpixel=False),
        stem=2,
    )
    assert len(fn_split.stages) == 2
    fn_mono = make_predict_fn(
        fine_apply, cfg, canvas,
        coarse_apply=lambda p, x: coarse.apply(p, x), allow_split=False,
    )
    image = jnp.asarray(make_case_arrays(seed=12, shape=canvas)[0], jnp.float32)
    la, sa = fn_split(pf, pc, image)
    lb, sb = fn_mono(pf, pc, image)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    assert (np.asarray(la) == np.asarray(lb)).mean() > 0.999


def test_staged_multitile_sweep_matches_monolithic():
    """The staged multi-tile TTA sweep (stack program | scan of merged
    fine+low-res reduce with in-program blending; VERDICT round-2 #4) must
    match the monolithic sliding-window program."""
    from brats2019_tpu.models.cascade import make_predict_fn

    ucfg2 = UNetConfig(levels=2, base_features=4, compute_dtype="float32",
                       stem_downsample=2)
    fine = UNet3D(ucfg2)
    fine_apply = lambda p, x: fine.apply(p, x)
    fine_lr = lambda p, x: fine.apply(p, x, subpixel=False)
    pf = fine.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    canvas = (24, 16, 16)  # 2-tile sweep along X, origins [0, 8]

    # (a) no-cascade whole-canvas sweep
    cfg = InferenceConfig(
        canvas=None, tile=(16, 16, 16), cascade=False, tta_flips=True,
        min_component_voxels=0, et_min_voxels=0,
        compute_dtype="float32", tta_precision="float32",
    )
    fn_staged = make_predict_fn(
        fine_apply, cfg, canvas, fine_lowres_apply=fine_lr, stem=2,
    )
    assert hasattr(fn_staged, "stages") and len(fn_staged.stages) == 2
    fn_mono = make_predict_fn(fine_apply, cfg, canvas, allow_split=False)
    image = jnp.asarray(make_case_arrays(seed=13, shape=canvas)[0], jnp.float32)
    la, sa = fn_staged(pf, None, image)
    lb, sb = fn_mono(pf, None, image)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    assert (np.asarray(la) == np.asarray(lb)).mean() > 0.999

    # (b) cascade with ROI larger than one tile (multi-tile ROI sweep)
    coarse = UNet3D(UCFG)
    pc = _init_params(1)
    cfg2 = InferenceConfig(
        canvas=None, tile=(16, 16, 16), cascade=True, tta_flips=True,
        coarse_shape=(16, 16, 16), roi_shape=(24, 16, 16),
        min_component_voxels=0, et_min_voxels=0,
        compute_dtype="float32", tta_precision="float32",
    )
    canvas2 = (32, 32, 32)
    fn_staged2 = make_predict_fn(
        fine_apply, cfg2, canvas2,
        coarse_apply=lambda p, x: coarse.apply(p, x),
        fine_lowres_apply=fine_lr, stem=2,
    )
    assert hasattr(fn_staged2, "stages") and len(fn_staged2.stages) == 2
    fn_mono2 = make_predict_fn(
        fine_apply, cfg2, canvas2,
        coarse_apply=lambda p, x: coarse.apply(p, x), allow_split=False,
    )
    image2 = jnp.asarray(make_case_arrays(seed=14, shape=canvas2)[0], jnp.float32)
    la2, sa2 = fn_staged2(pf, pc, image2)
    lb2, sb2 = fn_mono2(pf, pc, image2)
    np.testing.assert_array_equal(np.asarray(sa2), np.asarray(sb2))
    assert (np.asarray(la2) == np.asarray(lb2)).mean() > 0.999


def test_transfer_bound_hint_policy():
    """Serving telemetry: recommend (never auto-enable) int8 transfer only
    when host prep+transfer dominates the pipeline cadence."""
    from brats2019_tpu.infer.predictor import transfer_bound_hint

    # transfer dominates (100 ms of a 120 ms cadence) -> hint
    hint = transfer_bound_hint([0.1] * 8, 8 * 0.12, 8, "bfloat16")
    assert hint is not None and "int8" in hint

    # already int8 -> never hint
    assert transfer_bound_hint([0.1] * 8, 8 * 0.12, 8, "int8") is None

    # transfer is a small fraction of cadence -> no hint
    assert transfer_bound_hint([0.01] * 8, 8 * 0.12, 8, "bfloat16") is None

    # too few samples for a meaningful median -> no hint
    assert transfer_bound_hint([0.1] * 2, 2 * 0.12, 2, "bfloat16") is None


def test_probs_fn_matches_labels_all_paths():
    """The opt-in probability output (``probs_fn`` on every predict path)
    must be the same canvas the labels are argmaxed from: argmax(probs) ==
    labels (pre-postproc) and probs are a mean of softmaxes (sum to 1)."""
    from brats2019_tpu.models.cascade import make_predict_fn

    ucfg2 = UNetConfig(levels=2, base_features=4, compute_dtype="float32",
                       stem_downsample=2)
    fine = UNet3D(ucfg2)
    fine_apply = lambda p, x: fine.apply(p, x)
    fine_lr = lambda p, x: fine.apply(p, x, subpixel=False)
    pf = fine.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    coarse = UNet3D(UCFG)
    pc = _init_params(1)

    # (a) split fast path (cascade, roi == tile, stem=2 low-res reduce)
    cfg = InferenceConfig(
        canvas=None, tile=(16, 16, 16), cascade=True, tta_flips=True,
        coarse_shape=(16, 16, 16), roi_shape=(16, 16, 16),
        min_component_voxels=0, et_min_voxels=0,
        compute_dtype="float32", tta_precision="float32",
    )
    canvas = (32, 32, 32)
    fn = make_predict_fn(
        fine_apply, cfg, canvas,
        coarse_apply=lambda p, x: coarse.apply(p, x),
        fine_lowres_apply=fine_lr, stem=2,
    )
    image = jnp.asarray(make_case_arrays(seed=21, shape=canvas)[0], jnp.float32)
    labels, s1 = fn(pf, pc, image)
    probs, s2 = fn.probs_fn(pf, pc, image)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert probs.shape == labels.shape + (4,) and probs.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(probs, -1).astype(jnp.uint8)), np.asarray(labels)
    )

    # (b) staged multi-tile sweep (no cascade, 2-tile canvas)
    cfg_sw = InferenceConfig(
        canvas=None, tile=(16, 16, 16), cascade=False, tta_flips=True,
        min_component_voxels=0, et_min_voxels=0,
        compute_dtype="float32", tta_precision="float32",
    )
    canvas_sw = (24, 16, 16)
    fn_sw = make_predict_fn(
        fine_apply, cfg_sw, canvas_sw, fine_lowres_apply=fine_lr, stem=2,
    )
    image_sw = jnp.asarray(
        make_case_arrays(seed=22, shape=canvas_sw)[0], jnp.float32
    )
    labels_sw, _ = fn_sw(pf, None, image_sw)
    probs_sw, _ = fn_sw.probs_fn(pf, None, image_sw)
    assert probs_sw.shape == labels_sw.shape + (4,)
    np.testing.assert_allclose(np.asarray(probs_sw.sum(-1)), 1.0, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(probs_sw, -1).astype(jnp.uint8)),
        np.asarray(labels_sw),
    )

    # (c) monolithic path (allow_split=False)
    fn_mono = make_predict_fn(
        fine_apply, cfg, canvas,
        coarse_apply=lambda p, x: coarse.apply(p, x), allow_split=False,
    )
    labels_m, _ = fn_mono(pf, pc, image)
    probs_m, _ = fn_mono.probs_fn(pf, pc, image)
    assert probs_m.shape == labels_m.shape + (4,)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(probs_m, -1).astype(jnp.uint8)),
        np.asarray(labels_m),
    )


def test_predict_probs_arrays_and_npz(tmp_path):
    """Whole-volume probability output through the Predictor: shape, exact
    background one-hot outside the ROI, argmax agreement with the label
    path, and the --save-probs npz artifact."""
    from brats2019_tpu.data import synthetic

    exp = _make_exp(True)
    params, coarse = _init_params(0), _init_params(1)
    pred = Predictor(exp, params, coarse)
    image, _ = make_case_arrays(seed=23, shape=(40, 36, 28))
    labels, _ = pred.predict_arrays(image)
    probs, stats = pred.predict_probs_arrays(image)
    assert probs.shape == (40, 36, 28, 4) and probs.dtype == np.float32
    # default tta_precision stores per-flip softmaxes in bf16 -> the mean's
    # sum carries ~1e-3 rounding
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=5e-3)
    # outside the predicted ROI: exact background one-hot
    np.testing.assert_array_equal(probs[0, 0, 0], [1.0, 0.0, 0.0, 0.0])
    agree = (np.argmax(probs, -1).astype(np.uint8) == labels).mean()
    assert agree > 0.999  # postproc is a no-op in this config

    d = synthetic.write_case(str(tmp_path / "BraTS19_P_1"), shape=(32, 32, 24))
    out = pred.predict_probs_dir(d)
    z = np.load(out)
    assert z["probs"].shape == (32, 32, 24, 4)
    assert z["probs"].dtype == np.float16
    np.testing.assert_array_equal(z["classes"], [0, 1, 2, 4])


def test_ensemble_predictor(tmp_path):
    """Checkpoint ensembling (infer/ensemble.py): a 1-member ensemble
    reproduces the plain probability path EXACTLY; a 2-member ensemble's
    probabilities equal the member-wise mean (shared coarse stage -> same
    ROI, so the canvas mean is the probs mean); labels are the argmax of
    the mean, not a vote."""
    from brats2019_tpu.data import synthetic
    from brats2019_tpu.infer.ensemble import EnsemblePredictor

    exp = _make_exp(True)
    pA, pB, coarse = _init_params(0), _init_params(7), _init_params(1)
    image, _ = make_case_arrays(seed=31, shape=(40, 36, 28))

    probs_a, _ = Predictor(exp, pA, coarse).predict_probs_arrays(image)
    e1 = EnsemblePredictor(exp, [(pA, coarse)])
    probs_e1, _ = e1.predict_probs_arrays(image)
    np.testing.assert_array_equal(probs_e1, probs_a)

    probs_b, _ = Predictor(exp, pB, coarse).predict_probs_arrays(image)
    e2 = EnsemblePredictor(exp, [(pA, coarse), (pB, coarse)])
    assert e2.num_members == 2
    probs_e2, stats = e2.predict_probs_arrays(image)
    np.testing.assert_allclose(
        probs_e2, (probs_a + probs_b) / 2.0, atol=1e-6
    )
    assert stats.total_s > 0

    labels_e, _ = e2.predict_arrays(image)
    assert labels_e.shape == (40, 36, 28) and labels_e.dtype == np.uint8
    # postproc is a no-op in this config -> labels == argmax(mean probs)
    np.testing.assert_array_equal(
        labels_e, np.argmax(probs_e2, -1).astype(np.uint8)
    )

    d = synthetic.write_case(str(tmp_path / "BraTS19_E_1"), shape=(32, 32, 24))
    out, _ = e2.predict_dir(d)
    assert out.endswith("_pred.nii.gz")
    z = np.load(e2.predict_probs_dir(d))
    assert z["probs"].shape == (32, 32, 24, 4)

    import pytest

    with pytest.raises(ValueError):
        EnsemblePredictor(exp, [])


def test_ensemble_reload_members():
    """reload_members: the live ensemble swaps to new weights (and a new
    member COUNT) in place — probabilities match a freshly-built ensemble
    exactly; the per-device member cache is invalidated."""
    from brats2019_tpu.infer.ensemble import EnsemblePredictor

    exp = _make_exp(True)
    pA, pB, pC, coarse = (
        _init_params(0), _init_params(7), _init_params(13), _init_params(1)
    )
    image, _ = make_case_arrays(seed=33, shape=(40, 36, 28))

    ens = EnsemblePredictor(exp, [(pA, coarse), (pB, coarse)])
    before, _ = ens.predict_probs_arrays(image)

    ens.reload_members([(pB, coarse), (pC, coarse), (pA, coarse)])
    assert ens.num_members == 3
    after, _ = ens.predict_probs_arrays(image)
    fresh, _ = EnsemblePredictor(
        exp, [(pB, coarse), (pC, coarse), (pA, coarse)]
    ).predict_probs_arrays(image)
    np.testing.assert_array_equal(after, fresh)
    assert not np.array_equal(before, after)

    import pytest

    with pytest.raises(ValueError):
        ens.reload_members([])


def test_ensemble_member_parallel_matches_sequential():
    """Member-parallel dispatch (one member per local device, results
    gathered to the primary) must be BITWISE identical to the sequential
    single-device path — the accumulation order is fixed by member index
    either way."""
    import jax

    from brats2019_tpu.infer.ensemble import EnsemblePredictor

    exp = _make_exp(True)
    e = EnsemblePredictor(exp, [(_init_params(0), _init_params(1)),
                                (_init_params(7), _init_params(1))])
    image, _ = make_case_arrays(seed=41, shape=(40, 36, 28))
    canvas_img, _, _ = e._p._prep_to(image, e._p._default_dev)
    acc_s, cnt_s = e._accum_probs_device(canvas_img)
    acc_p, cnt_p = e._accum_probs_parallel(canvas_img)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(acc_s)), np.asarray(jax.device_get(acc_p))
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(cnt_s)), np.asarray(jax.device_get(cnt_p))
    )


def test_ensemble_partial_roi_coverage_mean():
    """Members' cascades may localize DIFFERENT ROIs: a voxel covered by
    only k of M members must divide by k (its own coverage), not M —
    dividing by M would scale a covered voxel's distribution by k/M and
    corrupt probs/uncertainty outputs. Exercises the device accumulators
    directly with two overlapping ROI placements."""
    import jax

    from brats2019_tpu.infer.ensemble import EnsemblePredictor

    exp = _make_exp(False)
    e = EnsemblePredictor(exp, [(_init_params(0), None),
                                (_init_params(7), None)])
    canvas = e._p.canvas  # (32, 32, 32) pool shape
    C = exp.unet.num_classes
    acc = jnp.zeros(canvas + (C,), jnp.float32)
    cnt = jnp.zeros(canvas, jnp.float32)
    roi = np.zeros((8, 8, 8, C), np.float32)
    roi[..., 1] = 0.9
    roi[..., 0] = 0.1
    # member A at (0,0,0), member B at (4,0,0): overlap is x in [4,8)
    acc, cnt = e._accum(acc, cnt, jnp.asarray(roi), jnp.zeros(3, jnp.int32))
    acc, cnt = e._accum(
        acc, cnt, jnp.asarray(roi), jnp.asarray([4, 0, 0], jnp.int32)
    )
    mean = np.asarray(jax.device_get(e._mean(acc, cnt)))
    cnt_np = np.asarray(jax.device_get(cnt))
    assert cnt_np[0, 0, 0] == 1 and cnt_np[5, 0, 0] == 2
    assert cnt_np[12, 0, 0] == 0
    # single-coverage voxel keeps its OWN distribution, not half of it
    np.testing.assert_allclose(mean[0, 0, 0], roi[0, 0, 0], atol=1e-6)
    # double-coverage voxel: mean of two identical contributions
    np.testing.assert_allclose(mean[5, 0, 0], roi[0, 0, 0], atol=1e-6)
    # uncovered voxel: all-zero (predict_probs_arrays backfills background)
    np.testing.assert_array_equal(mean[12, 0, 0], np.zeros(C))


def test_ensemble_predict_dirs_striped(tmp_path):
    """Multi-case ensemble serving: cases striped over the (virtual
    8-device) mesh with windowed dispatch must produce EXACTLY the masks
    the one-at-a-time path writes."""
    from brats2019_tpu.data import synthetic
    from brats2019_tpu.infer.ensemble import EnsemblePredictor
    from brats2019_tpu.utils.nifti import read_nifti

    exp = _make_exp(False)
    e = EnsemblePredictor(exp, [(_init_params(0), None),
                                (_init_params(7), None)])
    dirs = [
        synthetic.write_case(
            str(tmp_path / f"BraTS19_S_{i}_1"), shape=(32, 32, 24)
        )
        for i in range(3)
    ]
    outs = e.predict_dirs(
        dirs, output_paths=[str(tmp_path / f"striped_{i}.nii.gz")
                            for i in range(3)]
    )
    assert len(outs) == 3
    for i, d in enumerate(dirs):
        ref_out, _ = e.predict_dir(d)
        a, _ = read_nifti(outs[i], apply_scaling=False)
        b, _ = read_nifti(ref_out, apply_scaling=False)
        np.testing.assert_array_equal(a, b)


def test_region_uncertainty_maps():
    """QU-BraTS maps: 0 where a region's probability is 0 or 1, 100 at
    p=0.5; region channel sums follow train/metrics.py definitions."""
    from brats2019_tpu.infer.uncertainty import region_uncertainty_maps

    probs = np.zeros((2, 2, 1, 4), np.float32)
    probs[0, 0, 0] = [1, 0, 0, 0]           # pure background: all certain
    probs[0, 1, 0] = [0, 0, 0, 1]           # pure ET: certain everywhere
    probs[1, 0, 0] = [0.5, 0.5, 0, 0]       # WT/TC split: max uncertainty
    probs[1, 1, 0] = [0.5, 0, 0, 0.5]       # ET at p=0.5
    m = region_uncertainty_maps(probs)
    assert set(m) == {"whole", "core", "enhance"}
    for u in m.values():
        assert u.dtype == np.uint8 and u.shape == (2, 2, 1)
    for name in m:
        assert m[name][0, 0, 0] == 0        # p=0 -> certain
        assert m[name][0, 1, 0] == 0        # p=1 -> certain
        assert m[name][1, 1, 0] == 100      # p=0.5 in every region
    assert m["whole"][1, 0, 0] == 100       # p(WT)=0.5
    assert m["core"][1, 0, 0] == 100        # p(TC)=0.5
    assert m["enhance"][1, 0, 0] == 0       # p(ET)=0 -> certain
    # asymmetric case: WT prob 0.9 -> entropy ~0.469 -> 47
    probs2 = np.full((1, 1, 1, 4), 0.0, np.float32)
    probs2[..., 0], probs2[..., 2] = 0.1, 0.9
    m2 = region_uncertainty_maps(probs2)
    assert m2["whole"][0, 0, 0] == 47
    assert m2["core"][0, 0, 0] == 0 and m2["enhance"][0, 0, 0] == 0


def test_predict_uncertainty_dir(tmp_path):
    """End-to-end uncertainty maps through the Predictor: three NIfTIs in
    [0,100], background-certain outside the brain bbox."""
    from brats2019_tpu.data import synthetic
    from brats2019_tpu.infer.uncertainty import predict_uncertainty_dir
    from brats2019_tpu.utils.nifti import read_nifti

    d = synthetic.write_case(str(tmp_path / "BraTS19_U_1"), shape=(32, 32, 24))
    pred = Predictor(_make_exp(False), _init_params())
    outs = predict_uncertainty_dir(pred, d)
    assert len(outs) == 3
    for out in outs:
        u, _ = read_nifti(out, apply_scaling=False)
        assert u.shape == (32, 32, 24)
        assert u.min() >= 0 and u.max() <= 100
        assert u[0, 0, 0] == 0  # exact background one-hot -> certain
