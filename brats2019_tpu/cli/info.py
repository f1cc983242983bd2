"""``info`` — environment and deployment diagnostics.

Usage:
    python -m brats2019_tpu.cli.info [--preset cascade]

Prints one JSON document: JAX backend/devices, native loader status (built?
ABI version match?), compile-cache location, and the resolved preset's key
shapes. First thing to run when a deployment misbehaves.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="brats2019_tpu.info", description=__doc__)
    p.add_argument("--preset", default="cascade")
    return p


def gather(preset: str = "cascade") -> dict:
    import jax

    from .. import __name__ as pkg
    from ..configs.presets import PRESETS, get_preset
    from ..utils import nifti_fast

    info: dict = {"package": pkg}
    try:
        devs = jax.devices()
        info["jax"] = {
            "version": jax.__version__,
            "backend": devs[0].platform if devs else None,
            "device_count": len(devs),
            "devices": [str(d) for d in devs[:8]],
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
        }
    except Exception as e:  # backend bring-up failure is the diagnosis
        info["jax"] = {"error": f"{type(e).__name__}: {e}"}
    info["compile_cache_dir"] = jax.config.jax_compilation_cache_dir
    info["native_loader"] = {
        "available": nifti_fast.available(),
        "library": nifti_fast._LIB_PATH,
    }
    info["presets"] = sorted(PRESETS)
    if preset in PRESETS:
        exp = get_preset(preset)
        info["preset"] = {
            "name": exp.name,
            "cascade": exp.infer.cascade,
            "canvas": exp.infer.canvas,
            "tile": exp.infer.tile,
            "roi_shape": exp.infer.roi_shape,
            "tta_flips": exp.infer.tta_flips,
            "transfer_bucket": exp.infer.transfer_bucket,
            "transfer_dtype": exp.infer.transfer_dtype,
            "postproc": exp.infer.postproc,
            "unet": dataclasses.asdict(exp.unet),
            "workdir": exp.workdir,
        }
        info["artifacts"] = _artifact_status(exp)
    return info


def _artifact_status(exp) -> dict:
    """Deployment-artifact freshness for the resolved preset's workdir:
    which weights predict/serve would load per stage (and whether an
    export is STALER than the newest checkpoint — the silent-staleness
    trap load_stage_params warns about), plus the StableHLO export's
    manifest if present."""
    import os

    from .common import _latest_checkpoint_mtime

    out: dict = {}
    for stage in ("fine", "coarse"):
        sdir = os.path.join(exp.workdir, stage)
        entry: dict = {}
        exported = [
            p for p in (os.path.join(sdir, "params.safetensors"),
                        os.path.join(sdir, "params.npz"))
            if os.path.exists(p)
        ]
        ckpt_mtime = _latest_checkpoint_mtime(sdir)
        entry["has_checkpoint"] = ckpt_mtime > 0
        if exported:
            newest = max(exported, key=os.path.getmtime)
            entry["export"] = newest
            entry["export_stale"] = ckpt_mtime > os.path.getmtime(newest)
        if entry.get("has_checkpoint") or exported:
            out[stage] = entry
    man = os.path.join(exp.workdir, "stablehlo", "manifest.json")
    if os.path.exists(man):
        out["stablehlo_manifest"] = man
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.jax_setup import setup_jax

    setup_jax()
    json.dump(gather(args.preset), sys.stdout, indent=2, default=str)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
