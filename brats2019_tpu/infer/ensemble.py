"""Checkpoint ensembling at predict time (SURVEY.md C18's inference-side
complement: the reference paper's teacher ensemble — arXiv:2002.03688 —
averages several trained models' probabilities; this makes that ensemble a
first-class serving mode instead of an offline npz workflow).

TPU-first design, two halves:

* model parameters are TRACED arguments of the compiled probability
  program (infer/predictor.py ``probs_fn``), so an M-member ensemble
  reuses ONE jitted executable — member passes differ only in the param
  buffers streamed from HBM, and adding a member costs zero recompiles
  and zero extra program memory.
* the probability mean accumulates ON DEVICE: each member's ROI
  probabilities are added into a device-resident f32 canvas
  (dynamic-slice add at that member's cascade-localized start — members
  may localize different ROIs), and only the final argmax (uint8 canvas)
  or mean (f32 canvas) crosses the device boundary ONCE. A host-side
  mean would instead fetch an ~M x 60 MB f32 canvas stream — the
  dominant cost on any link, fatal on a weather-prone one. The
  accumulator buffer is donated so XLA updates it in place.

Member order is fixed, so the f32 sum is deterministic.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import ExperimentConfig
from ..data.constants import internal_to_disk
from ..utils.nifti import write_nifti
from .postprocess import postprocess_labels
from .predictor import (
    PredictionStats,
    Predictor,
    _start_host_copy,
    save_probs_npz,
)


class EnsemblePredictor:
    """Mean-probability ensemble over M trained members.

    ``members`` is a sequence of ``(params_fine, params_coarse)`` pairs
    (``params_coarse`` entries may be None when the experiment runs without
    the cascade). All members share one compiled program and one device.

    Labels come from ``argmax(mean_m probs_m)`` — NOT a vote over member
    argmaxes — matching the reference ensemble semantics. Connected-
    component postprocessing always runs on the HOST here: the in-graph
    device CC (``postproc="device"``) lives in the label program, which the
    ensemble path bypasses in favor of the probability program.
    """

    def __init__(
        self,
        exp: ExperimentConfig,
        members: Sequence[Tuple],
        canvas: Optional[Tuple[int, int, int]] = None,
    ):
        if not members:
            raise ValueError("EnsemblePredictor needs at least one member")
        pf0, pc0 = members[0]
        self._p = Predictor(exp, pf0, pc0, canvas=canvas)
        dev = self._p._default_dev
        self._member_cache: dict = {}
        # commit every member to the predictor's device once, up front —
        # per-call device_put would re-pay the transfer each volume
        self._members = [(self._p.params_fine, self._p.params_coarse)] + [
            (
                jax.device_put(pf, dev),
                jax.device_put(pc, dev) if pc is not None else None,
            )
            for pf, pc in members[1:]
        ]
        self.exp = exp

        # on-device accumulation helpers (module docstring): the ROI shape
        # is static per experiment, so the jits compile once. Alongside the
        # probability sum we track a per-voxel COVERAGE COUNT — members'
        # cascades can localize different ROIs, so a boundary voxel may be
        # written by only k < M members; its mean must divide by k, not M
        # (dividing by M would scale a covered voxel's distribution by k/M,
        # corrupting probs/uncertainty outputs; the argmax is count-
        # invariant — the count is a per-voxel scalar across classes — so
        # the labels path reads the raw sum).
        def _accum(acc, cnt, probs_r, start):
            idx4 = (start[0], start[1], start[2], jnp.int32(0))
            cur = jax.lax.dynamic_slice(acc, idx4, probs_r.shape)
            acc = jax.lax.dynamic_update_slice(acc, cur + probs_r, idx4)
            idx3 = (start[0], start[1], start[2])
            roi = probs_r.shape[:3]
            c = jax.lax.dynamic_slice(cnt, idx3, roi)
            cnt = jax.lax.dynamic_update_slice(cnt, c + 1.0, idx3)
            return acc, cnt

        # donate the accumulators: XLA reuses the canvas buffers in place
        # instead of allocating a fresh ~60 MB canvas per member
        self._accum = jax.jit(_accum, donate_argnums=(0, 1))
        self._argmax = jax.jit(
            lambda acc: jnp.argmax(acc, -1).astype(jnp.uint8)
        )
        # per-voxel mean on device: one fetch of the finished canvas
        self._mean = jax.jit(
            lambda acc, cnt: acc / jnp.maximum(cnt, 1.0)[..., None]
        )

    @property
    def num_members(self) -> int:
        return len(self._members)

    def warmup(self, probs: bool = False, stage: str = "all") -> float:
        """Pre-compile + pre-execute the ensemble serving programs on a
        zeros canvas (serve --warmup; rationale: Predictor.warmup). Warms
        the shared member probs program through the same auto dispatch
        serving uses (member-parallel when several devices exist), the
        donated accumulate, and the argmax/mean reducers.

        ``stage`` mirrors Predictor.warmup: ``"primary"`` = the label
        path (member accumulate + argmax — what the first queued case
        needs), ``"rest"`` = the probs mean reducer (QA artifacts only;
        the member program itself is shared and already warm after
        primary). Returns wall seconds."""
        from ..data.constants import NUM_MODALITIES

        t0 = time.time()
        x = jax.device_put(
            jnp.zeros(self._p.canvas + (NUM_MODALITIES,), jnp.bfloat16),
            self._p._default_dev,
        )
        outs = []
        if stage in ("all", "primary"):
            acc, _cnt = self._accum_probs_auto(x)
            outs.append(self._argmax(acc))
        if stage in ("all", "rest") and probs:
            acc, cnt = self._accum_probs_auto(x)
            outs.append(self._mean(acc, cnt))
        # fetch, not just block — warm the d2h path serving always uses
        # (rationale: Predictor.warmup)
        jax.device_get(outs)
        return time.time() - t0

    def reload_members(self, members: Sequence[Tuple]) -> None:
        """Swap every member's weights in place with zero recompiles
        (params are traced args of the shared member program) — the
        ensemble arm of the serve daemon's SIGHUP hot-reload. The member
        COUNT may change too: members are a Python loop over one compiled
        program, not a compiled-in constant."""
        if not members:
            raise ValueError("reload_members needs at least one member")
        pf0, pc0 = members[0]
        self._p.reload_params(pf0, pc0)
        dev = self._p._default_dev
        self._members = [(self._p.params_fine, self._p.params_coarse)] + [
            (
                jax.device_put(pf, dev),
                jax.device_put(pc, dev) if pc is not None else None,
            )
            for pf, pc in members[1:]
        ]
        self._member_cache.clear()

    def _member_on(self, i: int, dev):
        """Member i's params committed to ``dev``, cached per (member,
        device) — member-parallel dispatch places ONE member per device,
        so caching whole member lists per device would waste HBM."""
        if dev == self._p._default_dev:
            return self._members[i]
        key = (i, dev)
        if key not in self._member_cache:
            pf, pc = self._members[i]
            self._member_cache[key] = (
                jax.device_put(pf, dev),
                jax.device_put(pc, dev) if pc is not None else None,
            )
        return self._member_cache[key]

    def _members_on(self, dev):
        """All members committed to ``dev`` (multi-case striping runs a
        case's WHOLE ensemble on one device)."""
        return [self._member_on(i, dev) for i in range(len(self._members))]

    def _accum_probs_device(self, canvas_img, dev=None):
        """(sum, coverage-count) of member ROI probabilities on device-
        resident f32 canvases (NOT yet divided — argmax reads the raw sum,
        the mean divides per voxel by the count). Sequential member passes
        on ONE device — the multi-case serving path stripes whole cases
        instead (predict_dirs)."""
        dev = dev or self._p._default_dev
        results = []
        for pf, pc in self._members_on(dev):
            results.append(self._p._fn.probs_fn(pf, pc, canvas_img))
        return self._reduce_results(results, dev)

    def _accum_probs_parallel(self, canvas_img):
        """Member-PARALLEL dispatch: member i runs on local device i, all
        forwards concurrently, ROI results stream back to the primary
        device for the (order-fixed, bitwise-identical) accumulation —
        single-case ensemble latency ~= one forward + transfer instead of
        M forwards. Used by the single-volume entry points when several
        local devices exist; falls back to the sequential path otherwise.
        The input broadcast and result gather ride the device interconnect
        on real multi-chip hosts."""
        devs = jax.local_devices()
        dev0 = self._p._default_dev
        x_on = {dev0: canvas_img}  # one input broadcast per DEVICE, not
        results = []               # per member (members can outnumber devices)
        for i in range(len(self._members)):
            dev = devs[i % len(devs)]
            if dev not in x_on:
                x_on[dev] = jax.device_put(canvas_img, dev)
            pf, pc = self._member_on(i, dev)
            results.append(self._p._fn.probs_fn(pf, pc, x_on[dev]))
        return self._reduce_results(results, dev0)

    def _reduce_results(self, results, dev):
        """Accumulate (probs_r, start) member results onto ``dev`` in
        member order (deterministic f32 sum regardless of which device
        produced each result)."""
        shape = self._p.canvas + (self.exp.unet.num_classes,)
        acc = jax.device_put(jnp.zeros(shape, jnp.float32), dev)
        cnt = jax.device_put(jnp.zeros(self._p.canvas, jnp.float32), dev)
        for probs_r, start in results:
            if probs_r.devices() != {dev}:
                probs_r = jax.device_put(probs_r, dev)
                start = jax.device_put(start, dev)
            acc, cnt = self._accum(acc, cnt, probs_r, start)
        return acc, cnt

    def _accum_probs_auto(self, canvas_img):
        """Single-volume entry: member-parallel when the host has several
        devices and several members, else sequential."""
        if len(self._members) > 1 and len(jax.local_devices()) > 1:
            return self._accum_probs_parallel(canvas_img)
        return self._accum_probs_device(canvas_img)

    def _mean_probs_canvas(self, canvas_img) -> np.ndarray:
        """Host f32 per-voxel-mean canvas: one device->host fetch total.
        ``np.array`` (not asarray): device_get can hand back a READ-ONLY
        zero-copy view, and the downstream background fill mutates."""
        acc, cnt = self._accum_probs_auto(canvas_img)
        return np.array(jax.device_get(self._mean(acc, cnt)), np.float32)

    def predict_probs_arrays(
        self, image: np.ndarray, meta: Optional[dict] = None
    ) -> Tuple[np.ndarray, PredictionStats]:
        """Ensemble-mean class probabilities (X, Y, Z, C) f32; voxels no
        member wrote get exact background one-hot."""
        t0 = time.time()
        canvas_img, cropped_shape, bbox = self._p._prep_to(
            image, self._p._default_dev, meta=meta
        )
        t1 = time.time()
        canvas_p = self._mean_probs_canvas(canvas_img)
        t2 = time.time()
        probs = self._p._uncrop(canvas_p, cropped_shape, bbox)
        empty = probs.sum(-1) == 0
        probs[empty, 0] = 1.0
        t3 = time.time()
        return probs, PredictionStats(t1 - t0, t2 - t1, t3 - t2)

    def predict_arrays(
        self, image: np.ndarray, meta: Optional[dict] = None
    ) -> Tuple[np.ndarray, PredictionStats]:
        """argmax of the ensemble-mean probabilities -> internal labels
        (X, Y, Z) uint8, host postprocessed (C16)."""
        t0 = time.time()
        canvas_img, cropped_shape, bbox = self._p._prep_to(
            image, self._p._default_dev, meta=meta
        )
        t1 = time.time()
        labels, dev_s, post_s = self._labels_from_prepped(
            canvas_img, cropped_shape, bbox
        )
        return labels, PredictionStats(t1 - t0, dev_s, post_s)

    def _labels_from_prepped(self, canvas_img, cropped_shape, bbox):
        """Ensemble accumulate + argmax + host postprocess for an
        already-prepped canvas (shared by the array and case-dir entries)."""
        t1 = time.time()
        acc, _ = self._accum_probs_auto(canvas_img)
        # argmax on device: only a uint8 canvas crosses the link, and the
        # un-normalized sum argmaxes identically to the mean (the coverage
        # count is a per-voxel scalar across classes). Un-written canvas
        # voxels are all-zero -> argmax=0 = background.
        labels_c = np.asarray(jax.device_get(self._argmax(acc)))
        t2 = time.time()
        labels = self._p._uncrop(labels_c, cropped_shape, bbox)
        labels = postprocess_labels(
            labels,
            min_component_voxels=self.exp.infer.min_component_voxels,
            et_min_voxels=self.exp.infer.et_min_voxels,
        )
        return labels, t2 - t1, time.time() - t2

    def predict_case(self, case) -> Tuple[np.ndarray, PredictionStats]:
        """Predictor API parity (evaluate --ensemble comes through here)."""
        return self.predict_arrays(case.image, meta=case.meta)

    def predict_dir(
        self, case_dir: str, output_path: Optional[str] = None
    ) -> Tuple[str, PredictionStats]:
        t0 = time.time()
        name, header, canvas_img, shape, bbox = self._p._prep_dir_to(
            case_dir, self._p._default_dev
        )
        t1 = time.time()
        labels, dev_s, post_s = self._labels_from_prepped(
            canvas_img, shape, bbox
        )
        disk = internal_to_disk(labels).astype(np.uint8)
        if output_path is None:
            output_path = os.path.join(case_dir, f"{name}_pred.nii.gz")
        write_nifti(output_path, disk, like=header)
        return output_path, PredictionStats(t1 - t0, dev_s, post_s)

    def predict_dirs(self, case_dirs, output_paths=None) -> list:
        """Multi-case serving path (serve's batch entry point). Cases are
        striped round-robin across local devices, and device work is
        dispatched ahead of the host within a bounded window (all member
        passes are async — only the final uint8-canvas fetch blocks), so
        D devices run D cases' ensembles concurrently while the host
        decodes/writes. The window bound (``serving_depth`` volumes per
        device) caps in-flight f32 accumulator canvases (~60 MB each at
        flagship shapes)."""
        if output_paths is None:
            output_paths = [None] * len(case_dirs)
        devices = jax.local_devices()
        window = max(1, self.exp.infer.serving_depth) * len(devices)
        pending, outs = [], []

        def drain_one():
            name, header, d, labels_dev, shape, bbox, out = pending.pop(0)
            labels_c = np.asarray(jax.device_get(labels_dev))
            labels = self._p._uncrop(labels_c, shape, bbox)
            labels = postprocess_labels(
                labels,
                min_component_voxels=self.exp.infer.min_component_voxels,
                et_min_voxels=self.exp.infer.et_min_voxels,
            )
            disk = internal_to_disk(labels).astype(np.uint8)
            if out is None:
                out = os.path.join(d, f"{name}_pred.nii.gz")
            write_nifti(out, disk, like=header)
            outs.append(out)

        for i, (d, out) in enumerate(zip(case_dirs, output_paths)):
            dev = devices[i % len(devices)]
            name, header, canvas_img, shape, bbox = self._p._prep_dir_to(
                d, dev
            )
            labels_dev = self._argmax(
                self._accum_probs_device(canvas_img, dev=dev)[0]
            )
            _start_host_copy(labels_dev)
            pending.append((name, header, d, labels_dev, shape, bbox, out))
            while len(pending) >= window:
                drain_one()
        while pending:
            drain_one()
        return outs

    def prefill_payload_cache(self, case_dir: str) -> bool:
        """Serve-loop payload-cache prefill (rationale:
        Predictor.prefill_payload_cache); members share one prep, so the
        primary's encoder is THE encoder."""
        return self._p.prefill_payload_cache(case_dir)

    def probs_for_dir(self, case_dir: str):
        """Cache-aware ensemble-mean probability pass for one case dir
        (rationale: Predictor.probs_for_dir). Returns
        ``(name, header, probs)``."""
        name, header, canvas_img, shape, bbox = self._p._prep_dir_to(
            case_dir, self._p._default_dev
        )
        canvas_p = self._mean_probs_canvas(canvas_img)
        probs = self._p._uncrop(canvas_p, shape, bbox)
        empty = probs.sum(-1) == 0
        probs[empty, 0] = 1.0
        return name, header, probs

    def predict_probs_dir(
        self, case_dir: str, output_path: Optional[str] = None
    ) -> str:
        """Ensemble-mean probability canvas as ``<case>_probs.npz`` (same
        artifact contract as Predictor.predict_probs_dir)."""
        name, _header, probs = self.probs_for_dir(case_dir)
        if output_path is None:
            output_path = os.path.join(case_dir, f"{name}_probs.npz")
        return save_probs_npz(output_path, probs)
