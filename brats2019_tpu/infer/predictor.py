"""Whole-case prediction driver (SURVEY.md C17 + call stack §3.2).

Host side is deliberately thin: NIfTI decode, brain-bbox crop (the only
data-dependent-shape step, SURVEY.md §7.3.2), center-fit to the static
canvas, one host->device transfer of the raw cropped volume — then the whole
z-score -> cascade -> sliding-window+TTA -> blend -> argmax pipeline is a
single compiled XLA program (models/cascade.py). Connected-component
filtering and un-crop happen on the way back out; the output NIfTI reuses
the input header/affine (C1).
"""

from __future__ import annotations

import collections
import dataclasses
import os
import sys
import threading
import time
import weakref
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import ExperimentConfig
from ..data.case import Case, load_case
from ..data.constants import internal_to_disk
from ..data.preprocess import (
    BBox,
    brain_bbox_fast_np,
    crop_cast_bucket_np,
    crop_cast_fit_np,
    quantize_int8_per_modality,
)
from ..models.cascade import make_predict_fn
from ..models.unet3d import UNet3D
from ..utils.nifti import write_nifti
from .postprocess import postprocess_labels


def save_probs_npz(output_path: str, probs: np.ndarray) -> str:
    """The ``<case>_probs.npz`` artifact contract, in ONE place (predictor,
    ensemble, and the predict CLI all write through here): float16
    ``probs`` (X, Y, Z, C) + ``classes`` naming the channel order in BraTS
    disk labels [0, 1, 2, 4]."""
    import os

    # temp+rename: a reader (GET /artifact) must never see a torn file
    tmp = f"{output_path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f,
            probs=probs.astype(np.float16),
            classes=np.array([0, 1, 2, 4], np.int32),
        )
    os.replace(tmp, output_path)
    return output_path


def _start_host_copy(*arrays) -> None:
    """Kick off async device->host readback so it overlaps the next
    volume's device work (the blocking np.asarray in the post thread then
    finds the bytes already in flight). Each array is attempted
    independently — one failed kickoff must not skip the others (they just
    pay the blocking fetch later)."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except (AttributeError, RuntimeError):
            continue


class _PairDispatcher:
    """Groups per-volume flip-stacks into paired b16 fine programs
    (InferenceConfig.batch_volumes >= 2, split cascade path only;
    PERF.md "Cross-volume batching headroom": 11.2 vs 12.9 ms/sample).
    ``dispatch`` buffers one volume per device and fires the paired
    program when a second arrives; ``flush`` drains odd tails through the
    single-volume b8 program."""

    def __init__(self, predictor: "Predictor"):
        self.p = predictor
        self.pending: dict = {}  # device -> [(emit, tiles, start), ...]

    def dispatch(self, dev, x_dev, emit) -> None:
        pf, pc = self.p._params_on(dev)
        j_roi, _ = self.p._fn.stages
        tiles, start = j_roi(pc, x_dev)
        buf = self.pending.setdefault(dev, [])
        buf.append((emit, tiles, start))
        if len(buf) == 2:
            (e0, t0, s0), (e1, t1, s1) = buf
            la, sa, lb, sb = self.p._fn.fine_pair(pf, t0, t1, s0, s1)
            e0(la, sa)
            e1(lb, sb)
            buf.clear()

    def flush(self) -> None:
        for dev, buf in self.pending.items():
            pf, _ = self.p._params_on(dev)
            _, j_finish = self.p._fn.stages
            for emit, tiles, start in buf:
                emit(*j_finish(pf, tiles, start))
            buf.clear()


def transfer_bound_hint(
    prep_s, wall_s: float, n_volumes: int, transfer_dtype: str,
) -> Optional[str]:
    """Serving telemetry (VERDICT round-2 #1b "react when transfer-bound"):
    when the measured host prep+transfer occupies most of the pipeline
    cadence, RECOMMEND the int8 transfer encoding instead of silently
    switching to it — int8 is lossy (~99.999% mask agreement, PERF.md), so
    changing the wire encoding of medical masks is the operator's call,
    never an auto-toggle. Pure function so the policy is unit-testable."""
    if transfer_dtype == "int8" or n_volumes < 4 or len(prep_s) < 4:
        return None
    med = sorted(prep_s)[len(prep_s) // 2]
    cadence = wall_s / max(n_volumes, 1)
    if cadence <= 0 or med < 0.5 * cadence:
        return None
    return (
        f"note: host prep+transfer dominates serving (median {med * 1e3:.0f}"
        f" ms/volume ≈ {100 * med / cadence:.0f}% of the {cadence * 1e3:.0f}"
        f" ms pipeline cadence); if the host->device link is the wall, "
        f"--transfer-dtype int8 halves link bytes (lossy: ~99.999% mask "
        f"agreement, PERF.md 'int8 transfer encoding')"
    )


@dataclasses.dataclass
class PredictionStats:
    load_s: float
    device_s: float
    post_s: float

    @property
    def total_s(self) -> float:
        return self.load_s + self.device_s + self.post_s


class Predictor:
    """Reusable (jit-once) whole-volume predictor for an experiment."""

    def __init__(
        self,
        exp: ExperimentConfig,
        params_fine,
        params_coarse=None,
        canvas: Optional[Tuple[int, int, int]] = None,
    ):
        self.exp = exp
        if exp.infer.transfer_dtype not in ("bfloat16", "int8"):
            raise ValueError(
                f"transfer_dtype must be 'bfloat16' or 'int8', got "
                f"{exp.infer.transfer_dtype!r}"
            )
        self.canvas = tuple(canvas or exp.infer.canvas or exp.train.pool_shape)
        fine_model = UNet3D(exp.unet)
        fine_apply = lambda p, x: fine_model.apply(p, x)
        coarse_apply = None
        if exp.infer.cascade and exp.coarse_unet is not None and params_coarse is not None:
            coarse_model = UNet3D(exp.coarse_unet)
            coarse_apply = lambda p, x: coarse_model.apply(p, x)
        # commit params to one device so every call path shares ONE jit cache
        # entry (committed vs uncommitted placement are different jit keys —
        # mixing them recompiles the whole predict program; see PERF.md)
        self._default_dev = jax.local_devices()[0]
        self.params_fine = jax.device_put(params_fine, self._default_dev)
        self.params_coarse = (
            jax.device_put(params_coarse, self._default_dev)
            if params_coarse is not None
            else None
        )
        self._params_by_dev = {}
        self._prep_times: list = []       # serving telemetry (transfer hint)
        self._transfer_hinted = False
        # bounded in-memory payload memo (InferenceConfig.payload_memo_volumes)
        self._payload_memo: collections.OrderedDict = collections.OrderedDict()
        self._memo_lock = threading.Lock()
        self._fn = make_predict_fn(
            fine_apply,
            exp.infer,
            self.canvas,
            num_classes=exp.unet.num_classes,
            coarse_apply=coarse_apply,
            # pre-d2s head output enables the low-res TTA reduce on the
            # split fast path (bitwise-identical, ~20 ms/volume on v5e)
            fine_lowres_apply=lambda p, x: fine_model.apply(
                p, x, subpixel=False
            ),
            stem=exp.unet.stem_downsample,
        )
        # transfer-path embed: only the (bucketed) brain bbox crosses the
        # host->device link; this places it into the zero canvas on-device.
        # dst is a traced argument so offsets don't multiply cache entries;
        # the main predict program still sees ONE static canvas shape.
        canvas_shape = self.canvas

        @jax.jit
        def _embed(small, dst):
            # int8 transfer encoding dequantizes by cast alone (the in-graph
            # per-modality z-score is scale-invariant); embed in bf16 so the
            # main predict program sees ONE input dtype either way
            small = small.astype(jnp.bfloat16)
            zeros = jnp.zeros(canvas_shape + small.shape[3:], small.dtype)
            return jax.lax.dynamic_update_slice(
                zeros, small, (dst[0], dst[1], dst[2], jnp.int32(0))
            )

        self._embed = _embed

    def warmup(self, probs: bool = False, stage: str = "all") -> float:
        """Pre-compile AND pre-execute the serving device programs on a
        zeros canvas, so the first real case pays no cold compile (serve
        --warmup). On the axon tunnel a flagship cold compile ranges from
        ~3 s (remote side evidently reuses recently-compiled executables)
        through ~45 s (measured stage_roi 17 s + stage_finish 26 s) up to
        the 5-8 min the round-4 soak saw post-recycle (PERF.md "serve
        --warmup validated"); warming at daemon startup moves that whole
        variance off the first arriving case. Warms exactly the
        programs serving dispatches: the label program, the paired-stage
        programs when ``batch_volumes >= 2``, and the probs program when
        the daemon emits QA artifacts. The per-bucket ``_embed`` variants
        still compile on first arrival — they are trivial
        dynamic_update_slice programs (seconds, not minutes).

        ``stage`` splits the work so a post-recycle daemon can serve its
        first queued case as early as possible (VERDICT round-4 #6):
        ``"primary"`` warms only the single-volume label program — the one
        program the first queued case needs — ``"rest"`` warms the
        remaining arms (paired-stage, probs), ``"all"`` both. Returns
        wall seconds; blocks until the device finishes (and the warmup
        outputs are FETCHED — on the axon tunnel the d2h path can stall
        independently of program readiness, so the first real case's
        fetch must ride an established channel)."""
        from ..data.constants import NUM_MODALITIES

        t0 = time.time()
        x = jax.device_put(
            jnp.zeros(self.canvas + (NUM_MODALITIES,), jnp.bfloat16),
            self._default_dev,
        )
        pf, pc = self.params_fine, self.params_coarse
        outs = []
        if stage in ("all", "primary"):
            outs.append(self._fn(pf, pc, x))
        if stage in ("all", "rest"):
            if self._pair_dispatcher() is not None:
                # serving dispatches through the split-stage programs
                # instead of the monolithic one when pairing is on
                j_roi, j_finish = self._fn.stages
                tiles, start = j_roi(pc, x)
                outs.append(self._fn.fine_pair(pf, tiles, tiles, start, start))
                outs.append(j_finish(pf, tiles, start))  # odd-tail program
            if probs:
                outs.append(self._fn.probs_fn(pf, pc, x))
        jax.device_get(outs)
        return time.time() - t0

    def reload_params(self, params_fine, params_coarse=None) -> None:
        """Swap serving weights IN PLACE with zero recompiles: params are
        traced arguments of every compiled program (never baked in), so
        new values reuse the live executables — the serve daemon's SIGHUP
        hot-reload path. Must structurally match the current nets; the
        next dispatched volume picks the new weights up."""
        self.params_fine = jax.device_put(params_fine, self._default_dev)
        if params_coarse is not None:
            self.params_coarse = jax.device_put(
                params_coarse, self._default_dev
            )
        elif self.params_coarse is not None:
            raise ValueError(
                "reload_params: the cascade is active; pass params_coarse "
                "too (or retire the coarse stage by rebuilding the "
                "Predictor)"
            )
        self._params_by_dev.clear()

    def predict_arrays(
        self, image: np.ndarray, meta: Optional[dict] = None
    ) -> Tuple[np.ndarray, PredictionStats]:
        """image: raw (X, Y, Z, 4) float32 -> internal labels (X, Y, Z) uint8."""
        t0 = time.time()
        canvas_img, cropped_shape, bbox = self._prep_to(
            image, self._default_dev, meta=meta
        )
        t1 = time.time()
        labels_r, start = self._fn(self.params_fine, self.params_coarse, canvas_img)
        labels_c = self._paste_roi(
            np.asarray(jax.device_get(labels_r)), np.asarray(jax.device_get(start))
        )
        t2 = time.time()
        labels = self._uncrop(labels_c, cropped_shape, bbox)
        if self.exp.infer.postproc != "device":  # device path did C16 in-graph
            labels = postprocess_labels(
                labels,
                min_component_voxels=self.exp.infer.min_component_voxels,
                et_min_voxels=self.exp.infer.et_min_voxels,
            )
        t3 = time.time()
        return labels, PredictionStats(t1 - t0, t2 - t1, t3 - t2)

    def _uncrop(
        self,
        labels_canvas: np.ndarray,
        cropped_shape: Tuple[int, int, int],
        bbox: BBox,
    ) -> np.ndarray:
        """Invert fit_to_canvas + bbox crop back to the full volume."""
        from ..data.preprocess import uncrop_from_canvas_np

        return uncrop_from_canvas_np(
            labels_canvas, cropped_shape, bbox, self.canvas
        )

    def _paste_roi(self, labels_r: np.ndarray, start: np.ndarray) -> np.ndarray:
        """Place device ROI labels into a zero canvas (host memcpy)."""
        if labels_r.shape == self.canvas:
            return labels_r
        out = np.zeros(self.canvas, dtype=labels_r.dtype)
        sx, sy, sz = (int(v) for v in start)
        rx, ry, rz = labels_r.shape
        out[sx : sx + rx, sy : sy + ry, sz : sz + rz] = labels_r
        return out

    def _finish(self, fetched, cropped_shape, bbox) -> np.ndarray:
        labels_r_dev, start_dev = fetched
        labels_c = self._paste_roi(
            np.asarray(jax.device_get(labels_r_dev)),
            np.asarray(jax.device_get(start_dev)),
        )
        labels = self._uncrop(labels_c, cropped_shape, bbox)
        if self.exp.infer.postproc == "device":
            return labels
        return postprocess_labels(
            labels,
            min_component_voxels=self.exp.infer.min_component_voxels,
            et_min_voxels=self.exp.infer.et_min_voxels,
        )

    def predict_arrays_many(self, images) -> list:
        """Pipelined batch prediction: host prep, device execution, and host
        postprocessing run in overlapping stages (serving path — the device
        never waits for NIfTI decode or connected components).

        With multiple local devices, volumes are striped round-robin across
        them (each device runs the whole single-volume program on its own
        cases — the natural data-parallel serving decomposition; per-volume
        latency-sensitive multi-chip decomposition lives in
        parallel.spatial.distributed_tile_sweep).

        ``InferenceConfig.serving_depth`` bounds how many volumes may be in
        host prep / postprocess concurrently (depth>1 hedges transfer
        stalls on weather-prone links); ``batch_volumes >= 2`` pairs
        consecutive volumes into one b16 fine program (latency couples by
        one volume — co-located serving only)."""
        from concurrent.futures import ThreadPoolExecutor

        devices = jax.local_devices()
        depth = max(1, self.exp.infer.serving_depth)
        pair = self._pair_dispatcher()
        dev_of = lambda i: devices[(i // 2 if pair else i) % len(devices)]

        t_wall = time.time()
        with ThreadPoolExecutor(depth) as prep_pool, ThreadPoolExecutor(depth) as post_pool:
            preps = [
                prep_pool.submit(self._prep_to, img, dev_of(i))
                for i, img in enumerate(images)
            ]
            posts: dict = {}
            for i, fut in enumerate(preps):
                x_dev, shape, bbox = fut.result()
                if pair is None:
                    pf, pc = self._params_on(dev_of(i))
                    labels_r, start = self._fn(pf, pc, x_dev)
                    _start_host_copy(labels_r, start)
                    posts[i] = post_pool.submit(
                        self._finish, (labels_r, start), shape, bbox
                    )
                else:
                    def emit(labels_r, start, i=i, shape=shape, bbox=bbox):
                        _start_host_copy(labels_r, start)
                        posts[i] = post_pool.submit(
                            self._finish, (labels_r, start), shape, bbox
                        )

                    pair.dispatch(dev_of(i), x_dev, emit)
            if pair is not None:
                pair.flush()
            results = [posts[i].result() for i in range(len(images))]
        self._maybe_transfer_hint(len(images), time.time() - t_wall)
        return results

    def _maybe_transfer_hint(self, n: int, wall_s: float) -> None:
        """Print the transfer-bound advisory at most once per Predictor."""
        if self._transfer_hinted:
            return
        hint = transfer_bound_hint(
            self._prep_times[-n:], wall_s, n, self.exp.infer.transfer_dtype
        )
        if hint:
            self._transfer_hinted = True
            print(hint, file=sys.stderr)

    def _pair_dispatcher(self):
        """Active only when configured AND the split cascade fast path is in
        use (it exposes .stages/.fine_pair)."""
        if (
            self.exp.infer.batch_volumes >= 2
            and hasattr(self._fn, "stages")
            and hasattr(self._fn, "fine_pair")
        ):
            return _PairDispatcher(self)
        return None

    def _params_on(self, dev):
        """Per-device committed copies of the (frozen) inference params."""
        if dev == self._default_dev:
            return self.params_fine, self.params_coarse
        if dev not in self._params_by_dev:
            self._params_by_dev[dev] = (
                jax.device_put(self.params_fine, dev),
                jax.device_put(self.params_coarse, dev)
                if self.params_coarse is not None
                else None,
            )
        return self._params_by_dev[dev]

    def _encode_host(
        self, image: np.ndarray, meta: Optional[dict] = None
    ) -> Tuple[np.ndarray, Optional[np.ndarray], BBox]:
        """Host half of the transfer path: brain bbox -> (bucketed)
        crop/cast -> optional int8 quantize. Returns the transfer payload
        ``(small, dst, bbox)`` — exactly the bytes that cross the
        host->device link. ``dst is None`` means ``small`` is already the
        full canvas (unbucketed bf16 path). Deterministic for a fixed
        (input, canvas, bucket, transfer dtype), which is what makes the
        payload cacheable (disk cache + in-memory memo; VERDICT r3 #5).

        ``meta`` reuses the native loader's fused brain bbox; without it
        the strided exact bbox + one-pass crop/cast/fit keep host prep at
        ~55 ms/volume (vs ~220 ms for full-scan + three passes — the
        serving wall on this 1-core host, PERF.md)."""
        if meta is not None:
            bbox = BBox(
                tuple(int(v) for v in meta["bbox_lo"]),
                tuple(int(v) for v in meta["bbox_hi"]),
                image.shape[:3],
            )
        else:
            bbox = brain_bbox_fast_np(image)
        bucket = self.exp.infer.transfer_bucket
        int8 = self.exp.infer.transfer_dtype == "int8"
        if bucket:
            # int8 quantizes from f32 so the bucketed and full-canvas
            # encodings are bitwise-identical (same nonzero set -> same
            # per-modality scale); bf16 path casts during the crop
            small, dst = crop_cast_bucket_np(
                image, bbox, self.canvas, bucket,
                dtype=np.float32 if int8 else None,
            )
            if int8:
                small = quantize_int8_per_modality(small)
            return small, np.asarray(dst, np.int32), bbox
        if int8:
            # full-canvas transfer still honors the int8 encoding: quantize
            # the whole canvas and dequantize via the embed's cast
            small = quantize_int8_per_modality(
                crop_cast_fit_np(image, bbox, self.canvas, dtype=np.float32)
            )
            return small, np.zeros(3, np.int32), bbox
        return crop_cast_fit_np(image, bbox, self.canvas), None, bbox

    def _payload_to_device(self, small: np.ndarray,
                           dst: Optional[np.ndarray], dev):
        """Ship a host payload across the link and embed it into the static
        zero canvas on-device (the only per-volume host->device traffic)."""
        if dst is None:
            return jax.device_put(jnp.asarray(small), dev)
        small_dev = jax.device_put(jnp.asarray(small), dev)
        dst_dev = jax.device_put(np.asarray(dst, np.int32), dev)
        return self._embed(small_dev, dst_dev)

    def _memo_encode(
        self, image: np.ndarray, meta: Optional[dict] = None
    ) -> Tuple[np.ndarray, Optional[np.ndarray], BBox]:
        """_encode_host through the bounded in-memory payload memo, keyed
        by array identity — repeat in-memory volumes (ensemble members,
        probs+uncertainty second passes, re-submitted serving arrays) skip
        the bbox scan and crop/cast/quantize entirely; the host->device
        transfer itself still happens per dispatch.

        Entries hold a WEAK reference to the keyed array: when the caller
        drops its last reference (a stream of distinct volumes), the entry
        dies and is swept on the next call, so the memo never pins freed
        ~143 MB input volumes (nor keeps their payloads) on streams with
        no repeats. A dead weakref also means its id() may be recycled —
        the liveness check (``ent[0]() is image``) makes recycled ids
        read as misses, never as wrong payloads. The serving contract
        (documented on InferenceConfig.payload_memo_volumes) is that
        submitted arrays are not mutated in place afterwards."""
        cap = self.exp.infer.payload_memo_volumes
        if cap <= 0:
            return self._encode_host(image, meta)
        # the bbox source is part of the key: the same array submitted once
        # with the loader's fused bbox meta and once without must not alias
        # to whichever payload was computed first (the two bbox paths are
        # equivalent by test, but provenance must not silently cross)
        meta_tok = None if meta is None else (
            tuple(int(v) for v in meta["bbox_lo"]),
            tuple(int(v) for v in meta["bbox_hi"]),
        )
        key = (id(image), meta_tok)
        with self._memo_lock:
            for k in [k for k, e in self._payload_memo.items()
                      if e[0]() is None]:
                del self._payload_memo[k]  # sweep dead entries + payloads
            ent = self._payload_memo.get(key)
            if ent is not None and ent[0]() is image:
                self._payload_memo.move_to_end(key)
                return ent[1]
        payload = self._encode_host(image, meta)
        try:
            ref = weakref.ref(image)
        except TypeError:
            return payload  # non-weakref-able input: serve uncached
        with self._memo_lock:
            self._payload_memo[key] = (ref, payload)
            self._payload_memo.move_to_end(key)
            while len(self._payload_memo) > cap:
                self._payload_memo.popitem(last=False)
        return payload

    def _prep_to(self, image: np.ndarray, dev, meta: Optional[dict] = None):
        """Host encode (memoized) + explicit-device transfer (the transfer
        overlaps with the previous volume's device work — it runs in the
        prep thread)."""
        t0 = time.time()
        small, dst, bbox = self._memo_encode(image, meta)
        canvas_img = self._payload_to_device(small, dst, dev)
        # wall time of host encode + transfer dispatch (includes queue
        # backpressure when the link is the wall); list.append is atomic
        # under the GIL so prep threads need no lock
        self._prep_times.append(time.time() - t0)
        del self._prep_times[:-64]
        return canvas_img, bbox.shape, bbox

    def _prep_dir_to(self, case_dir: str, dev):
        """Case-directory prep through the on-disk payload cache (VERDICT
        r3 #5): a hit loads the stored transfer payload and skips NIfTI
        gzip decode, the brain-bbox scan, and crop/cast/quantize — only
        the header read (348 bytes at the head of the t1 stream, for
        output write-back) and the host->device transfer remain. A miss
        decodes normally and stores the payload for the next arrival of
        the same input signature (re-serves, folds, ensemble batches).
        The stored payload is bitwise what the uncached path ships, so
        masks are identical either way (tests/test_payload_cache.py).

        Returns ``(case_name, header, canvas_img, cropped_shape, bbox)``."""
        from ..data.case import modality_paths
        from ..utils.nifti import read_header
        from .payload_cache import (
            load_payload, payload_cache_path, store_payload,
        )

        cache_dir = self.exp.infer.prep_cache_dir
        name = os.path.basename(os.path.normpath(case_dir))
        t0 = time.time()
        path = None
        if cache_dir:
            path = payload_cache_path(
                cache_dir, case_dir, self.canvas,
                self.exp.infer.transfer_bucket,
                self.exp.infer.transfer_dtype,
            )
            payload = load_payload(path)
            if payload is not None:
                small, dst, bbox = payload
                header = read_header(modality_paths(case_dir)[0])
                canvas_img = self._payload_to_device(small, dst, dev)
                self._prep_times.append(time.time() - t0)
                del self._prep_times[:-64]
                return name, header, canvas_img, bbox.shape, bbox
        case = load_case(case_dir, load_seg=False)
        small, dst, bbox = self._encode_host(case.image, case.meta)
        if path is not None:
            store_payload(path, small, dst, bbox)
        canvas_img = self._payload_to_device(small, dst, dev)
        self._prep_times.append(time.time() - t0)
        del self._prep_times[:-64]
        return case.name, case.header, canvas_img, bbox.shape, bbox

    def prefill_payload_cache(self, case_dir: str) -> bool:
        """Decode + encode one case into the on-disk payload cache WITHOUT
        touching the device — the serve daemon's watch loop calls this
        from a background thread for arrivals queued behind the current
        batch (VERDICT round-4 #5), so by the time their turn comes
        ``_prep_dir_to`` is a warm hit (~25 ms host) instead of a cold
        gzip-decode+bbox (~640-1200 ms on a 1-core host). Exactly the
        miss path of ``_prep_dir_to`` minus the transfer, so the stored
        payload is bitwise what serving would have stored. Returns True
        when it wrote a new entry (False: cache off, or already warm)."""
        from .payload_cache import payload_cache_path, store_payload

        cache_dir = self.exp.infer.prep_cache_dir
        if not cache_dir:
            return False
        path = payload_cache_path(
            cache_dir, case_dir, self.canvas,
            self.exp.infer.transfer_bucket,
            self.exp.infer.transfer_dtype,
        )
        # existence check only: the filename embeds the input-signature
        # hash, so a listed entry IS warm (a rare corrupt entry self-heals
        # as a serve-time miss)
        if os.path.exists(path):
            return False
        from ..data.case import load_case as _load_case

        case = _load_case(case_dir, load_seg=False)
        small, dst, bbox = self._encode_host(case.image, case.meta)
        store_payload(path, small, dst, bbox)
        return True

    def predict_probs_arrays(
        self, image: np.ndarray, meta: Optional[dict] = None
    ) -> Tuple[np.ndarray, PredictionStats]:
        """Mean class probabilities for the whole volume (X, Y, Z, C) f32 —
        the same TTA-averaged canvas the labels are argmaxed from, for
        offline ensembling / uncertainty workflows. Voxels outside the
        predicted ROI/brain bbox get exact background one-hot."""
        t0 = time.time()
        canvas_img, cropped_shape, bbox = self._prep_to(
            image, self._default_dev, meta=meta
        )
        t1 = time.time()
        probs, dev_s, post_s = self._probs_from_prepped(
            canvas_img, cropped_shape, bbox
        )
        return probs, PredictionStats(t1 - t0, dev_s, post_s)

    def _probs_from_prepped(self, canvas_img, cropped_shape, bbox):
        """Device probs program + host un-crop for an already-prepped
        canvas (shared by the array and case-dir probs entry points)."""
        t1 = time.time()
        canvas_p = self._probs_canvas_np(
            self.params_fine, self.params_coarse, canvas_img
        )
        t2 = time.time()
        probs = self._uncrop(canvas_p, cropped_shape, bbox)
        empty = probs.sum(-1) == 0  # never written -> exact background
        probs[empty, 0] = 1.0
        return probs, t2 - t1, time.time() - t2

    def _probs_canvas_np(self, params_fine, params_coarse, canvas_img):
        """Run the probs program for ONE set of params and paste its ROI
        into a full canvas (host f32). Params are traced arguments of the
        jitted program, so alternate members (ensembling) reuse the same
        compiled executable."""
        probs_r, start = self._fn.probs_fn(params_fine, params_coarse, canvas_img)
        probs_np = np.asarray(jax.device_get(probs_r), np.float32)
        start_np = np.asarray(jax.device_get(start))
        if probs_np.shape[:3] == self.canvas:
            return probs_np
        canvas_p = np.zeros(self.canvas + (probs_np.shape[-1],), np.float32)
        sx, sy, sz = (int(v) for v in start_np)
        rx, ry, rz = probs_np.shape[:3]
        canvas_p[sx:sx + rx, sy:sy + ry, sz:sz + rz] = probs_np
        return canvas_p

    def probs_for_dir(self, case_dir: str):
        """Cache-aware probability pass for one case directory: the decode
        rides the payload disk cache (``--prep-cache``) and bucketed
        transfer exactly like the label pass, instead of re-decoding from
        gzip (the QA-artifact path previously paid the full decode a
        second time per served case). Returns ``(name, header, probs)``."""
        name, header, canvas_img, shape, bbox = self._prep_dir_to(
            case_dir, self._default_dev
        )
        probs, _, _ = self._probs_from_prepped(canvas_img, shape, bbox)
        return name, header, probs

    def predict_probs_dir(
        self, case_dir: str, output_path: Optional[str] = None
    ) -> str:
        """Write a case's probability canvas as ``<case>_probs.npz``
        (float16 ``probs`` (X, Y, Z, 4) + ``classes`` naming the channel
        order in BraTS disk labels [0, 1, 2, 4])."""
        name, _header, probs = self.probs_for_dir(case_dir)
        if output_path is None:
            output_path = os.path.join(case_dir, f"{name}_probs.npz")
        return save_probs_npz(output_path, probs)

    def predict_case(self, case: Case) -> Tuple[np.ndarray, PredictionStats]:
        return self.predict_arrays(case.image, meta=case.meta)

    def predict_dirs(self, case_dirs, output_paths=None) -> list:
        """Pipelined multi-case CLI path: NIfTI decode (native threaded
        loader), device execution, postprocess + NIfTI write all overlap.
        ``output_paths[i]`` overrides where case i's prediction is written
        (default: ``<case_dir>/<case>_pred.nii.gz``). Returns output paths."""
        from concurrent.futures import ThreadPoolExecutor

        devices = jax.local_devices()
        if output_paths is None:
            output_paths = [None] * len(case_dirs)
        pair = self._pair_dispatcher()
        dev_of = lambda i: devices[(i // 2 if pair else i) % len(devices)]

        def load_and_prep(i_d):
            i, d = i_d
            # decode + encode via the payload cache when configured
            # (prep_cache_dir); repeat input signatures skip gzip + bbox
            return self._prep_dir_to(d, dev_of(i))

        def finish_and_write(name, header, fetched, shape, bbox, case_dir,
                             out):
            labels = self._finish(fetched, shape, bbox)
            disk = internal_to_disk(labels).astype(np.uint8)
            if out is None:
                out = os.path.join(case_dir, f"{name}_pred.nii.gz")
            write_nifti(out, disk, like=header)
            return out

        depth = max(1, self.exp.infer.serving_depth)
        t_wall = time.time()
        with ThreadPoolExecutor(depth) as prep_pool, ThreadPoolExecutor(depth) as post_pool:
            preps = [
                prep_pool.submit(load_and_prep, (i, d))
                for i, d in enumerate(case_dirs)
            ]
            posts: dict = {}
            for i, (fut, d) in enumerate(zip(preps, case_dirs)):
                name, header, x_dev, shape, bbox = fut.result()
                if pair is None:
                    pf, pc = self._params_on(dev_of(i))
                    labels_r, start = self._fn(pf, pc, x_dev)
                    _start_host_copy(labels_r, start)
                    posts[i] = post_pool.submit(
                        finish_and_write, name, header, (labels_r, start),
                        shape, bbox, d, output_paths[i],
                    )
                else:
                    def emit(labels_r, start, i=i, name=name, header=header,
                             shape=shape, bbox=bbox, d=d):
                        _start_host_copy(labels_r, start)
                        posts[i] = post_pool.submit(
                            finish_and_write, name, header, (labels_r, start),
                            shape, bbox, d, output_paths[i],
                        )

                    pair.dispatch(dev_of(i), x_dev, emit)
            if pair is not None:
                pair.flush()
            results = [posts[i].result() for i in range(len(case_dirs))]
        # same transfer-bound telemetry as predict_arrays_many — serve and
        # the multi-case predict CLI come through THIS path, so the int8
        # recommendation must fire here too
        self._maybe_transfer_hint(len(case_dirs), time.time() - t_wall)
        return results

    def predict_dir(
        self, case_dir: str, output_path: Optional[str] = None
    ) -> Tuple[str, PredictionStats]:
        """Reference CLI shape: predict on a BraTS case directory, write the
        segmentation NIfTI next to it (or at output_path)."""
        t0 = time.time()
        name, header, canvas_img, shape, bbox = self._prep_dir_to(
            case_dir, self._default_dev
        )
        t1 = time.time()
        labels_r, start = self._fn(
            self.params_fine, self.params_coarse, canvas_img
        )
        # _finish = fetch + paste + uncrop + host postproc (the ONE shared
        # tail, also used by the pipelined path); its wall lands in the
        # stats' middle slot, the NIfTI write in the last
        labels = self._finish((labels_r, start), shape, bbox)
        t2 = time.time()
        disk = internal_to_disk(labels).astype(np.uint8)
        if output_path is None:
            output_path = os.path.join(case_dir, f"{name}_pred.nii.gz")
        write_nifti(output_path, disk, like=header)
        stats = PredictionStats(t1 - t0, t2 - t1, time.time() - t2)
        return output_path, stats
