"""Measure a reproduced reference-style CPU pipeline to anchor vs_baseline
(SURVEY.md §6: "Reference CPU volumes/sec: unknown — measure a reproduced
CPU pipeline to anchor the 5x").

This is a faithful re-creation of the reference's execution model — PyTorch
CPU (the only backend available here), per-tile Python loop, per-flip TTA
loop, NumPy preproc/blending on the host — with the same network width,
tile grid and flip count as our 'inference' preset, on a synthetic full-size
BraTS volume.

A full volume is n_tiles x 8 flips forwards of a full-width 3D U-Net at
128^3 — tens of minutes on this 1-core host — so the steady-state per-tile
cost is measured directly and the volume total is composed from measured
parts (methodology stored in BASELINE_LOCAL.json).

Usage: python tools/measure_cpu_baseline.py [--quick]
Writes: BASELINE_LOCAL.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchDoubleConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = nn.Conv3d(cin, cout, 3, padding=1, bias=False)
        self.n1 = nn.InstanceNorm3d(cout, affine=True)
        self.c2 = nn.Conv3d(cout, cout, 3, padding=1, bias=False)
        self.n2 = nn.InstanceNorm3d(cout, affine=True)

    def forward(self, x):
        x = F.relu(self.n1(self.c1(x)))
        return F.relu(self.n2(self.c2(x)))


class TorchUNet3D(nn.Module):
    """Torch mirror of brats2019_tpu.models.unet3d.UNet3D (NCDHW)."""

    def __init__(self, levels=5, base=24, maxf=256, num_classes=4, cin=4):
        super().__init__()
        feats = [min(base * 2 ** l, maxf) for l in range(levels)]
        self.levels = levels
        self.enc = nn.ModuleList()
        c = cin
        for f in feats:
            self.enc.append(TorchDoubleConv(c, f))
            c = f
        self.dec = nn.ModuleList(
            [TorchDoubleConv(feats[l] + feats[l + 1], feats[l])
             for l in range(levels - 1)]
        )
        self.head = nn.Conv3d(feats[0], num_classes, 1)

    def forward(self, x):
        skips = []
        for l in range(self.levels):
            x = self.enc[l](x)
            if l < self.levels - 1:
                skips.append(x)
                x = F.avg_pool3d(x, 2)
        for l in reversed(range(self.levels - 1)):
            x = F.interpolate(x, scale_factor=2, mode="trilinear",
                              align_corners=False)
            x = torch.cat([x, skips[l]], dim=1)
            x = self.dec[l](x)
        return self.head(x)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1 repetition instead of 2 per measurement")
    args = ap.parse_args()
    reps = 1 if args.quick else 2

    torch.set_num_threads(os.cpu_count() or 1)
    from brats2019_tpu.data.synthetic import make_case_arrays
    from brats2019_tpu.data.preprocess import brain_bbox_np, crop_np, zscore_np
    from brats2019_tpu.data.pipeline import fit_to_canvas
    from brats2019_tpu.infer.tiling import tile_origins

    print("generating 240x240x155 synthetic case ...", file=sys.stderr)
    image, _ = make_case_arrays(seed=0, shape=(240, 240, 155))

    # --- host preprocessing (timed fully) ---
    t0 = time.time()
    z = zscore_np(image)
    bbox = brain_bbox_np(z)
    cropped = crop_np(z, bbox)
    canvas = fit_to_canvas(cropped, (192, 224, 160))
    preproc_s = time.time() - t0
    print(f"preproc: {preproc_s:.2f}s", file=sys.stderr)

    fine = TorchUNet3D(levels=5, base=24).eval()
    coarse = TorchUNet3D(levels=4, base=16, maxf=128).eval()

    with torch.no_grad():
        # --- coarse stage: whole canvas at low res ---
        x = torch.from_numpy(np.ascontiguousarray(
            canvas.transpose(3, 0, 1, 2)[None]))
        t0 = time.time()
        xc = F.interpolate(x, size=(96, 112, 80), mode="trilinear",
                           align_corners=False)
        _ = coarse(xc)
        coarse_s = time.time() - t0
        print(f"coarse stage: {coarse_s:.2f}s", file=sys.stderr)

        # --- fine stage: measure one 128^3 tile forward ---
        tile = torch.from_numpy(
            np.ascontiguousarray(canvas[:128, :128, :128].transpose(3, 0, 1, 2)[None])
        )
        _ = fine(tile)  # warmup / allocator
        times = []
        for _i in range(reps):
            t0 = time.time()
            _ = fine(tile)
            times.append(time.time() - t0)
        tile_s = float(np.median(times))
        print(f"fine tile forward: {tile_s:.2f}s", file=sys.stderr)

    # --- compose the full-volume cost ---
    roi = (160, 192, 160)
    n_tiles = len(tile_origins(roi, (128, 128, 128), overlap=0.5))
    n_flips = 8
    blend_s = 0.5  # host accumulate/argmax estimate (generous lower bound)
    volume_s = preproc_s + coarse_s + n_tiles * n_flips * tile_s + blend_s
    vps = 1.0 / volume_s
    print(
        f"composed: {n_tiles} tiles x {n_flips} flips x {tile_s:.2f}s "
        f"+ preproc {preproc_s:.2f}s + coarse {coarse_s:.2f}s "
        f"=> {volume_s:.1f}s/volume = {vps:.5f} volumes/sec",
        file=sys.stderr,
    )

    out = {
        "reference_cpu_volumes_per_sec": round(vps, 6),
        "methodology": (
            "torch-CPU re-creation of the reference pipeline (per-tile python "
            "loop, 8-flip TTA, NumPy preproc): volume cost composed as "
            "preproc + coarse + n_tiles*8*tile_forward + blend, with the "
            "128^3 fine-tile forward measured directly"
        ),
        "parts_sec": {
            "preproc": round(preproc_s, 3),
            "coarse": round(coarse_s, 3),
            "fine_tile": round(tile_s, 3),
            "n_tiles": n_tiles,
            "n_flips": n_flips,
        },
        "host": {"cpu_count": os.cpu_count(), "torch": torch.__version__},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_LOCAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), file=sys.stderr)
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
