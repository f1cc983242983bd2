"""Checkpoint ensembling at predict time (SURVEY.md C18's inference-side
complement: the reference paper's teacher ensemble — arXiv:2002.03688 —
averages several trained models' probabilities; this makes that ensemble a
first-class serving mode instead of an offline npz workflow).

TPU-first design: model parameters are TRACED arguments of the compiled
probability program (infer/predictor.py ``probs_fn``), so an M-member
ensemble reuses ONE jitted executable — member passes differ only in the
param buffers streamed from HBM, and adding a member costs zero recompiles
and zero extra program memory. Probabilities are averaged on pasted host
canvases because each member's cascade may localize a different ROI start;
the mean is taken in f32 in member order (deterministic).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from ..configs.presets import ExperimentConfig
from ..data.case import load_case
from ..data.constants import internal_to_disk
from ..utils.nifti import write_nifti
from .postprocess import postprocess_labels
from .predictor import PredictionStats, Predictor


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

    @property
    def num_members(self) -> int:
        return len(self._members)

    def _mean_probs_canvas(self, canvas_img) -> np.ndarray:
        """Sequential member passes through the shared compiled program;
        f32 running sum on the host canvas (one canvas live at a time)."""
        acc = None
        for pf, pc in self._members:
            c = self._p._probs_canvas_np(pf, pc, canvas_img)
            acc = c if acc is None else acc + c
        acc *= 1.0 / len(self._members)
        return acc

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
        canvas_p = self._mean_probs_canvas(canvas_img)
        t2 = time.time()
        # un-written canvas voxels have all-zero probs -> argmax=0 =
        # background, so no explicit background fill is needed for labels
        labels_c = np.argmax(canvas_p, axis=-1).astype(np.uint8)
        labels = self._p._uncrop(labels_c, cropped_shape, bbox)
        labels = postprocess_labels(
            labels,
            min_component_voxels=self.exp.infer.min_component_voxels,
            et_min_voxels=self.exp.infer.et_min_voxels,
        )
        t3 = time.time()
        return labels, PredictionStats(t1 - t0, t2 - t1, t3 - t2)

    def predict_dir(
        self, case_dir: str, output_path: Optional[str] = None
    ) -> Tuple[str, PredictionStats]:
        case = load_case(case_dir, load_seg=False)
        labels, stats = self.predict_arrays(case.image, meta=case.meta)
        disk = internal_to_disk(labels).astype(np.uint8)
        if output_path is None:
            output_path = os.path.join(
                case_dir, f"{case.name}_pred.nii.gz"
            )
        write_nifti(output_path, disk, like=case.header)
        return output_path, stats

    def predict_dirs(self, case_dirs, output_paths=None) -> list:
        """Sequential multi-case path (serve's batch entry point). The
        device stays busy across a case's M member passes; cross-case
        prep/post overlap is deliberately NOT pipelined here — the
        single-model Predictor's pipelined path exists for latency-bound
        serving, the ensemble trades that for accuracy."""
        if output_paths is None:
            output_paths = [None] * len(case_dirs)
        return [
            self.predict_dir(d, out)[0]
            for d, out in zip(case_dirs, output_paths)
        ]

    def predict_probs_dir(
        self, case_dir: str, output_path: Optional[str] = None
    ) -> str:
        """Ensemble-mean probability canvas as ``<case>_probs.npz`` (same
        artifact contract as Predictor.predict_probs_dir)."""
        case = load_case(case_dir, load_seg=False)
        probs, _ = self.predict_probs_arrays(case.image, meta=case.meta)
        if output_path is None:
            output_path = os.path.join(case_dir, f"{case.name}_probs.npz")
        np.savez_compressed(
            output_path,
            probs=probs.astype(np.float16),
            classes=np.array([0, 1, 2, 4], np.int32),
        )
        return output_path
