"""Multi-chip whole-volume inference entry points (SURVEY.md §7.4 /
docs/MULTIHOST.md "Inference at scale"; VERDICT round-2 #9: expose the
mesh decompositions through the CLI, not just the library).

Three decompositions over a ``('data',)`` device mesh:

* ``spatial`` — ONE whole-volume forward, the volume's X axis sharded
  across chips with ppermute halo exchange for conv/resize boundary
  correctness and psum'd exact InstanceNorm stats
  (parallel/spatial_unet.py). Latency-optimal for a single volume;
  requires canvas X divisible by ``stem * 2^(levels-1) * n_devices``.
* ``sweep`` — the sliding-window (tile x 8-flip) work-item list striped
  across chips, each device blending its items into an ROI-restricted
  canvas merged by one psum (parallel/spatial.py). Works for any mesh
  size; throughput-optimal for the tiled config-4 shape.
* ``cascade`` — the FLAGSHIP program's decomposition (VERDICT round-3
  #3): the coarse localization stage replicated on every device (cheap,
  no collective), the fine ROI's (tile x flip) work items striped across
  the mesh, the TTA reduce in the low-res block form, one ROI-sized
  psum. Produces the cascade predictor's masks at mesh-parallel cost.

All consume the standard trained UNet3D parameter pytree(s). Parity
contracts:

* ``cascade`` matches the single-device CASCADE Predictor (the flagship
  path: coarse localization + fine ROI + 8-flip TTA + blending) —
  validated on the 8-virtual-device CPU mesh,
  tests/test_multichip_cli.py::test_multichip_cascade_*.
* ``sweep`` runs the SAME tile grid/blending/TTA as the single-device
  predictor with ``cascade=False`` — masks match it (validated on the
  8-virtual-device CPU mesh, tests/test_multichip_cli.py). Single-stage:
  the coarse stage is bypassed.
* ``spatial`` is ONE whole-volume forward: no TTA, no sliding window,
  and InstanceNorm statistics over the whole volume instead of per tile.
  Its parity reference is the UNSHARDED whole-volume forward (exact,
  tests/test_spatial_unet.py) — masks are close to, but not identical
  to, the tiled path's (measured delta: docs/MULTIHOST.md).

The predict CLI prints a notice when spatial/sweep bypass a cascade
preset's coarse stage; ``--multichip cascade`` is the mode that doesn't.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import ExperimentConfig
from ..data.preprocess import (
    BBox, brain_bbox_fast_np, crop_cast_fit_np, uncrop_from_canvas_np, zscore,
)
from ..parallel.mesh import MeshEnv, make_mesh
from .postprocess import postprocess_labels
from .tiling import blend_weight, tile_origins


# the one shared inverse of crop_cast_fit_np + bbox crop, also used by the
# single-device Predictor._uncrop (kept importable here for the CLI tests)
uncrop_labels = uncrop_from_canvas_np


class MultichipPredictor:
    """Whole-case prediction over a device mesh (mode='spatial'|'sweep').

    Host side mirrors the single-device Predictor (bbox crop, center-fit,
    z-score, postprocess, un-crop); the device program is the chosen mesh
    decomposition, jit-once and reused across cases.
    """

    def __init__(
        self,
        exp: ExperimentConfig,
        params_fine,
        mode: str = "sweep",
        env: Optional[MeshEnv] = None,
        params_coarse=None,
        members=None,
    ):
        if mode not in ("spatial", "sweep", "cascade"):
            raise ValueError(
                f"multichip mode must be spatial|sweep|cascade, got {mode!r}"
            )
        if members is not None and mode != "cascade":
            raise ValueError(
                "--multichip ensemble composition is cascade-mode only "
                "(spatial/sweep are single-stage whole-canvas programs); "
                "use --multichip cascade with --ensemble"
            )
        self.exp = exp
        self.mode = mode
        self.env = env or make_mesh()
        self.canvas = tuple(exp.infer.canvas or exp.train.pool_shape)
        self.params = jax.device_put(params_fine, self.env.replicated())
        self._members = None
        # jit-once like every other program here (NOT per predict_arrays
        # call — re-tracing per case costs a compile-cache lookup, and a
        # full remote compile when the cache is cold)
        self._zscore = jax.jit(lambda v: zscore(v.astype(jnp.float32)))
        ucfg = exp.unet
        if mode == "cascade":
            from ..models.unet3d import UNet3D
            from ..parallel.spatial import distributed_cascade_sweep

            if not (exp.infer.cascade and exp.coarse_unet is not None):
                raise ValueError(
                    "--multichip cascade needs a cascade preset (coarse_unet "
                    "set and infer.cascade on); use --multichip sweep for "
                    "single-stage configs"
                )
            if params_coarse is None:
                raise ValueError(
                    "--multichip cascade needs the trained coarse-stage "
                    "params (no coarse checkpoint found?)"
                )
            self.params_coarse = jax.device_put(
                params_coarse, self.env.replicated()
            )
            fine_model = UNet3D(ucfg)
            coarse_model = UNet3D(exp.coarse_unet)
            if members is not None:
                # K-member ensemble x mesh composition (VERDICT round-4
                # #3): one mesh program runs every member's cascade sweep
                # and argmaxes the accumulated mean — the EnsemblePredictor
                # semantics at mesh-parallel cost (parallel/spatial.py
                # distributed_cascade_ensemble)
                from ..parallel.spatial import distributed_cascade_ensemble

                self._put_members(members)
                self._ensemble = distributed_cascade_ensemble(
                    lambda p, x: fine_model.apply(p, x),
                    lambda p, x: coarse_model.apply(p, x),
                    self.env,
                    exp.infer,
                    self.canvas,
                    ucfg.num_classes,
                    self._members_fine,
                    self._members_coarse,
                    stem=ucfg.stem_downsample,
                    fine_lowres_apply=lambda p, x: fine_model.apply(
                        p, x, subpixel=False
                    ),
                )
                return
            self._cascade = distributed_cascade_sweep(
                lambda p, x: fine_model.apply(p, x),
                lambda p, x: coarse_model.apply(p, x),
                self.env,
                exp.infer,
                self.canvas,
                ucfg.num_classes,
                self.params,
                self.params_coarse,
                stem=ucfg.stem_downsample,
                fine_lowres_apply=lambda p, x: fine_model.apply(
                    p, x, subpixel=False
                ),
            )
        elif mode == "spatial":
            from ..parallel.spatial_unet import make_spatial_unet

            req = ucfg.min_spatial * self.env.n_data
            if self.canvas[0] % req:
                raise ValueError(
                    f"--multichip spatial needs canvas X ({self.canvas[0]}) "
                    f"divisible by stem*2^(levels-1)*n_devices = {req}; use "
                    f"--multichip sweep or a different device count"
                )
            self._fwd = make_spatial_unet(self.env, ucfg)
        else:
            from ..models.unet3d import UNet3D
            from ..parallel.spatial import distributed_tile_sweep

            model = UNet3D(ucfg)
            tile = tuple(exp.infer.tile)
            origins = tile_origins(self.canvas, tile, exp.infer.overlap)
            weight = blend_weight(
                tile, exp.infer.blend, exp.infer.gaussian_sigma_frac
            )
            self._sweep = distributed_tile_sweep(
                # params ride as a runtime argument (params=...), NOT a
                # closure — a closure would embed the full fine-model
                # pytree into the executable as constants
                lambda prm, p: jax.nn.softmax(
                    model.apply(prm, p[None])[0].astype(jnp.float32), -1
                ),
                self.env,
                self.canvas,
                origins,
                tile,
                weight,
                ucfg.num_classes,
                n_flips=8 if exp.infer.tta_flips else 1,
                params=self.params,
            )

    def _put_members(self, members) -> None:
        """Commit the (params_fine, params_coarse) member pairs replicated
        onto the mesh. Cascade-mode members need a coarse stage each
        (cli/common.load_ensemble_members substitutes the primary's)."""
        repl = self.env.replicated()
        mfs, mcs = [], []
        for pf, pc in members:
            if pc is None:
                raise ValueError(
                    "--multichip cascade --ensemble needs a coarse stage "
                    "per member (none found and no primary to substitute)"
                )
            mfs.append(jax.device_put(pf, repl))
            mcs.append(jax.device_put(pc, repl))
        self._members = list(zip(mfs, mcs))
        self._members_fine = mfs
        self._members_coarse = mcs

    @property
    def num_members(self) -> int:
        """Ensemble member count (1 when not an ensemble) — API parity
        with EnsemblePredictor for the CLIs' log lines."""
        return len(self._members) if self._members is not None else 1

    def warmup(self, stage: str = "all") -> float:
        """Pre-compile + pre-execute the mesh program on a zeros canvas
        (serve --multichip --warmup; rationale: Predictor.warmup). An
        all-zero volume exercises the identical static-shape program —
        content only steers the coarse ROI placement, never the compiled
        graph. ``stage``: multichip serving is ONE mesh program, so
        ``"primary"`` == ``"all"`` and ``"rest"`` is a no-op (API parity
        with Predictor.warmup for the staged serve startup). Returns
        wall seconds."""
        from ..data.constants import NUM_MODALITIES

        if stage == "rest":
            return 0.0
        t0 = time.time()
        x = jnp.zeros(self.canvas + (NUM_MODALITIES,), jnp.bfloat16)
        if self._members is not None:
            out = self._ensemble(x, self._members_fine, self._members_coarse)
        elif self.mode == "cascade":
            out = self._cascade(x, self.params, self.params_coarse)
        else:
            xz = self._zscore(x)
            if self.mode == "spatial":
                out = self._fwd(self.params, xz)
            else:
                out = self._sweep(xz, params_override=self.params)
        # fetch, not just block — warm the d2h path serving always uses
        # (rationale: Predictor.warmup)
        jax.device_get(out)
        return time.time() - t0

    def reload_params(self, params_fine, params_coarse=None) -> None:
        """Hot-swap serving weights with ZERO recompiles (serve --multichip
        + SIGHUP): params are traced ARGUMENTS of the jitted mesh programs,
        so same-shaped replacements reuse the compiled executables — the
        same contract as Predictor.reload_params."""
        self.params = jax.device_put(params_fine, self.env.replicated())
        if self.mode == "cascade":
            if params_coarse is None:
                raise ValueError(
                    "mode='cascade' reload needs the coarse-stage params"
                )
            self.params_coarse = jax.device_put(
                params_coarse, self.env.replicated()
            )

    def reload_members(self, members) -> None:
        """Hot-swap every ensemble member's weights with zero recompiles
        (members are traced args of the jitted mesh program; a changed
        member COUNT retraces once) — the serve daemon's SIGHUP arm for
        --multichip cascade --ensemble."""
        if self._members is None:
            raise ValueError("reload_members on a non-ensemble predictor")
        if not members:
            raise ValueError("reload_members needs at least one member")
        self._put_members(members)

    def predict_dir(self, case_dir: str, output_path: Optional[str] = None):
        """Serving-daemon API parity with Predictor: predict one BraTS case
        directory, write ``<case>_pred.nii.gz`` (or ``output_path``).
        Decode and write are host-side; the whole mesh runs one case at a
        time (the decomposition IS the parallelism — serve --multichip)."""
        import os

        from ..data.case import load_case
        from ..data.constants import internal_to_disk
        from ..utils.nifti import write_nifti

        case = load_case(case_dir, load_seg=False)
        labels = self.predict_arrays(case.image)
        disk = internal_to_disk(labels).astype(np.uint8)
        if output_path is None:
            output_path = os.path.join(case_dir, f"{case.name}_pred.nii.gz")
        write_nifti(output_path, disk, like=case.header)
        return output_path

    def predict_dirs(self, case_dirs, output_paths=None) -> list:
        """Predictor.predict_dirs drop-in for the serving daemon: cases run
        sequentially, each over the full mesh (no round-robin striping —
        multi-chip mode trades per-volume latency for the mesh)."""
        if output_paths is None:
            output_paths = [None] * len(case_dirs)
        return [
            self.predict_dir(d, out)
            for d, out in zip(case_dirs, output_paths)
        ]

    def predict_case(self, case):
        """Predictor API parity (evaluate --multichip comes through here).
        Multichip mode does not split out prep/device/post timings, so the
        stats slot is None."""
        return self.predict_arrays(case.image), None

    def predict_arrays(self, image: np.ndarray) -> np.ndarray:
        bbox = brain_bbox_fast_np(image)
        # same prep chain as the single-device Predictor (crop/cast, then
        # the DEVICE z-score) so masks match it, not just approximate it
        canvas_img = crop_cast_fit_np(image, bbox, self.canvas)
        if self._members is not None:
            # ensemble composition: the mesh program returns FULL-canvas
            # labels (members may localize different ROIs; the mean
            # accumulates on a canvas inside the program)
            labels_c = np.asarray(jax.device_get(self._ensemble(
                jnp.asarray(canvas_img),
                self._members_fine, self._members_coarse,
            )))
            labels = uncrop_labels(labels_c, bbox.shape, bbox, self.canvas)
            return postprocess_labels(
                labels,
                min_component_voxels=self.exp.infer.min_component_voxels,
                et_min_voxels=self.exp.infer.et_min_voxels,
            )
        if self.mode == "cascade":
            # z-score runs INSIDE the mesh program (exactly where the
            # single-device cascade program runs it); the device returns
            # ROI labels + placement, pasted host-side like Predictor
            labels_r, start = self._cascade(
                jnp.asarray(canvas_img), self.params, self.params_coarse
            )
            labels_c = np.zeros(self.canvas, np.uint8)
            sx, sy, sz = (int(v) for v in np.asarray(jax.device_get(start)))
            lr = np.asarray(jax.device_get(labels_r))
            rx, ry, rz = lr.shape
            labels_c[sx:sx + rx, sy:sy + ry, sz:sz + rz] = lr
            labels = uncrop_labels(labels_c, bbox.shape, bbox, self.canvas)
            return postprocess_labels(
                labels,
                min_component_voxels=self.exp.infer.min_component_voxels,
                et_min_voxels=self.exp.infer.et_min_voxels,
            )
        x = self._zscore(jnp.asarray(canvas_img))
        if self.mode == "spatial":
            logits = self._fwd(self.params, jnp.asarray(x))
            labels_c = np.asarray(
                jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.uint8)
            )
        else:
            probs = self._sweep(jnp.asarray(x), params_override=self.params)
            labels_c = np.asarray(jnp.argmax(probs, -1).astype(jnp.uint8))
        labels = uncrop_labels(labels_c, bbox.shape, bbox, self.canvas)
        return postprocess_labels(
            labels,
            min_component_voxels=self.exp.infer.min_component_voxels,
            et_min_voxels=self.exp.infer.et_min_voxels,
        )
