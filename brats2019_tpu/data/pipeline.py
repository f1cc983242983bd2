"""Host->device input pipeline: the device-resident case pool (SURVEY.md C6,
N4; BASELINE.json:11 "sharded host->device input pipeline").

The reference feeds the GPU from NumPy DataLoader workers that re-slice
patches on the host every step. TPU-first inversion: whole preprocessed
cases live in device HBM as a fixed-size *pool*, sharded over the data axis;
patch sampling + augmentation happen inside the jitted train step (zero
host->device traffic per step). The host's only steady-state job is
refreshing pool slots with freshly decoded cases in a background thread —
sized for this container's single CPU core.

Layout (global shapes; leading axis sharded over the ``('data',)`` mesh):
  pool_img : (K, X, Y, Z, 4)  bfloat16, z-scored, bbox-cropped to the canvas
  pool_seg : (K, X, Y, Z)     uint8 internal labels
  pool_fg  : (K, T, 3)        int32 foreground-voxel table for biased sampling

Checkpoint/resume: the deterministic case cursor (epoch, index) is part of
the training checkpoint (SURVEY.md §5 "loader position").
"""

from __future__ import annotations

import dataclasses
import os
import queue
import sys
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import ml_dtypes

from ..parallel.mesh import DATA_AXIS, MeshEnv
from .case import Case, load_case, modality_paths, seg_path
from .preprocess import brain_bbox_fast_np, crop_np, zscore_np
from .sampling import FG_TABLE_SIZE, build_fg_table_np

BF16 = np.dtype(ml_dtypes.bfloat16)

# bump when prepare_training_case's output semantics change — stale cache
# entries (older version, different canvas/downsample, touched inputs) are
# never read because the version + prep params + input file signature are
# all part of the cache filename
PREP_CACHE_VERSION = 1


def fit_to_canvas(vol: np.ndarray, canvas: Tuple[int, int, int], fill=0) -> np.ndarray:
    """Center-pad (or center-crop) spatial dims to exactly ``canvas``
    (placement arithmetic shared with the serving crop/un-crop via
    preprocess.center_fit_axis)."""
    from .preprocess import center_fit_axis

    out_shape = tuple(canvas) + vol.shape[3:]
    out = np.full(out_shape, fill, dtype=vol.dtype)
    src_sl, dst_sl = [], []
    for ax in range(3):
        start, n, dst = center_fit_axis(vol.shape[ax], canvas[ax])
        src_sl.append(slice(start, start + n))
        dst_sl.append(dst)
    out[tuple(dst_sl)] = vol[tuple(src_sl)]
    return out


def prepare_training_case(
    case: Case,
    canvas: Tuple[int, int, int],
    downsample: int = 1,
) -> Dict[str, np.ndarray]:
    """Full host-side prep: z-score -> bbox crop -> canvas fit -> fg table.

    ``downsample`` > 1 produces the stage-1 (coarse) training view: the
    volume is average-pooled by that factor *before* canvas fitting, so the
    coarse model sees the whole brain at low resolution (SURVEY.md C8).
    """
    img = zscore_np(case.image)
    seg = case.seg if case.seg is not None else np.zeros(img.shape[:3], np.uint8)
    # strided EXACT bbox (same result as the full scan, ~15 vs ~165 ms —
    # this runs in the refresh thread that shares the 1-core host with
    # the train loop, so the full-scan version directly taxed training)
    bbox = brain_bbox_fast_np(img)
    img = crop_np(img, bbox)
    seg = crop_np(seg, bbox)
    if downsample > 1:
        d = downsample
        # trim to multiples, then box-average image / stride-subsample labels
        trim = tuple((s // d) * d for s in img.shape[:3])
        img = img[: trim[0], : trim[1], : trim[2]]
        seg = seg[: trim[0], : trim[1], : trim[2]]
        img = img.reshape(
            trim[0] // d, d, trim[1] // d, d, trim[2] // d, d, -1
        ).mean(axis=(1, 3, 5))
        seg = seg[d // 2 :: d, d // 2 :: d, d // 2 :: d]
    img = fit_to_canvas(img.astype(np.float32), canvas)
    seg = fit_to_canvas(seg.astype(np.uint8), canvas)
    return {
        "image": img.astype(BF16),
        "seg": seg,
        "fg": build_fg_table_np(seg, FG_TABLE_SIZE),
    }


def _case_signature_hash(case_dir: str, with_seg: bool = True) -> str:
    """sha1 of the (mtime_ns, size) signature of every input file — editing
    or re-uploading a case invalidates any cache entry keyed on this.
    st_mtime_ns, not whole seconds: a case rewritten within the same second
    with unchanged sizes must still invalidate its entry."""
    import hashlib

    paths = list(modality_paths(case_dir))
    if with_seg:
        sp = seg_path(case_dir)
        if sp:
            paths.append(sp)
    sig = "|".join(
        f"{os.path.basename(p)}:{os.stat(p).st_mtime_ns}:{os.path.getsize(p)}"
        for p in paths
    )
    return hashlib.sha1(sig.encode()).hexdigest()[:16]


def _prep_cache_path(
    cache_dir: str, case_dir: str, canvas, downsample: int
) -> str:
    """Cache filename keyed by everything that determines the prep output:
    version, canvas, downsample, and the input-file signature hash."""
    h = _case_signature_hash(case_dir)
    base = os.path.basename(os.path.normpath(case_dir))
    c = "x".join(map(str, canvas))
    return os.path.join(
        cache_dir,
        f"{base}.v{PREP_CACHE_VERSION}.c{c}.d{downsample}.{h}.npz",
    )


def cached_prepare_training_case(
    case_dir: str, canvas, downsample: int = 1,
    cache_dir: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """prepare_training_case with an optional on-disk cache of the prepped
    arrays (z-scored bf16 canvas + labels + fg table). Skips the dominant
    host work of a pool refresh — gzip inflate, z-score, bbox scan — on the
    1-core serving/training host; one cache entry is ~(canvas bytes) and
    loads as a single uncompressed npz read. bf16 has no stable npz
    encoding, so the image is stored as its uint16 bit pattern."""
    if not cache_dir:
        return prepare_training_case(
            load_case(case_dir), canvas, downsample=downsample
        )
    path = _prep_cache_path(cache_dir, case_dir, canvas, downsample)
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return {
                    "image": z["image_u16"].view(BF16),
                    "seg": z["seg"],
                    "fg": z["fg"],
                }
        except Exception as e:  # noqa: BLE001 — corrupt entry: rebuild
            print(f"[pool] discarding corrupt cache entry {path}: {e}",
                  file=sys.stderr, flush=True)
    out = prepare_training_case(
        load_case(case_dir), canvas, downsample=downsample
    )
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        # uncompressed npz: the point is to beat gzip-decode time, and the
        # write is atomic (rename) so concurrent hosts sharing a cache dir
        # never read a torn entry. savez gets a FILE OBJECT so it cannot
        # append its own .npz suffix to the tmp name
        with open(tmp, "wb") as f:
            np.savez(f, image_u16=np.asarray(out["image"]).view(np.uint16),
                     seg=out["seg"], fg=out["fg"])
        os.replace(tmp, path)
        # prune SUPERSEDED entries for the same case+prep params — older
        # input signature OR older PREP_CACHE_VERSION (unreadable after a
        # bump): without this, every re-upload or version bump leaks a
        # ~50 MB orphan forever. Filename = base.vN.cC.dD.hash.npz; match
        # on (base, cC, dD), ignore vN and hash
        def _entry_key(fn: str):
            parts = fn.rsplit(".", 5)
            return (parts[0], parts[2], parts[3]) if len(parts) == 6 else None

        mine = os.path.basename(path)
        key = _entry_key(mine)
        for fn in os.listdir(cache_dir):
            if fn.endswith(".npz") and fn != mine and _entry_key(fn) == key:
                try:
                    os.remove(os.path.join(cache_dir, fn))
                except OSError:
                    pass
    except OSError as e:
        print(f"[pool] prep-cache write failed ({e}); continuing uncached",
              file=sys.stderr, flush=True)
        try:
            os.remove(tmp)
        except OSError:
            pass
    return out


@dataclasses.dataclass
class CaseCursor:
    """Deterministic shuffled traversal of the case list; checkpointable.

    On a multi-host slice every process constructs the SAME per-epoch
    permutation (seeded identically) but walks a disjoint interleaved
    subsequence of it: process p of H visits permutation positions
    p, p+H, p+2H, ... (``offset``/``stride``). ``index`` counts positions
    within this process's own subsequence, so checkpoint/restore is
    per-process exact.
    """

    n_cases: int
    seed: int = 0
    epoch: int = 0
    index: int = 0
    stride: int = 1
    offset: int = 0

    def _order(self) -> np.ndarray:
        rng = np.random.default_rng(self.seed + self.epoch * 1_000_003)
        return rng.permutation(self.n_cases)

    def _positions_per_epoch(self) -> int:
        if self.offset >= self.n_cases:
            # degenerate: fewer cases than hosts — this host reuses one slot
            # (duplication is unavoidable; never starve the pool)
            return 1
        return (self.n_cases - 1 - self.offset) // self.stride + 1

    def next_index(self) -> int:
        order = self._order()
        pos = self.offset + self.index * self.stride
        i = int(order[pos % self.n_cases])
        self.index += 1
        if self.index >= self._positions_per_epoch():
            self.index = 0
            self.epoch += 1
        return i

    def state(self) -> Dict[str, int]:
        # stride/offset are topology-derived (process_count/index) and are
        # re-established at construction; persist traversal position only.
        return {"epoch": self.epoch, "index": self.index, "seed": self.seed}

    def load_state(self, s: Dict[str, int]) -> None:
        self.epoch, self.index, self.seed = s["epoch"], s["index"], s["seed"]


class CasePool:
    """Sharded device-resident pool of preprocessed cases with background
    host refresh. Single-controller style: on a multi-host slice each
    process constructs only its addressable shards
    (``jax.make_array_from_single_device_arrays``)."""

    def __init__(
        self,
        case_dirs: Sequence[str],
        env: MeshEnv,
        canvas: Tuple[int, int, int],
        cases_per_device: int,
        downsample: int = 1,
        seed: int = 0,
        prefetch: int = 2,
        prep_cache_dir: Optional[str] = None,
    ):
        if not case_dirs:
            raise ValueError("CasePool needs at least one case")
        self.case_dirs = list(case_dirs)
        self.env = env
        self.canvas = tuple(canvas)
        self.downsample = downsample
        self.prep_cache_dir = prep_cache_dir
        all_devices = list(env.mesh.devices.reshape(-1))
        # each process feeds only its addressable devices (multi-host safe)
        self.devices = [
            d for d in all_devices if d.process_index == jax.process_index()
        ]
        self.k_local = cases_per_device
        self.k_global = cases_per_device * len(all_devices)
        # Disjoint interleaved traversal per host: without this, every
        # process would fill its shards from an identical sequence and all
        # hosts would load the same cases (ADVICE round-1 medium).
        self.cursor = CaseCursor(
            len(self.case_dirs),
            seed=seed,
            stride=jax.process_count(),
            offset=jax.process_index(),
        )
        self._queue: "queue.Queue[Dict[str, np.ndarray]]" = queue.Queue(
            maxsize=prefetch
        )
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._slot = 0
        self._warned: set = set()  # case dirs already reported unreadable

        # per-device single-device buffers, reassembled into global arrays
        self._shards: Dict[str, List[list]] = {"image": [], "seg": [], "fg": []}
        self._build_initial()

    # -- host side ---------------------------------------------------------
    def _load_next(self) -> Dict[str, np.ndarray]:
        d = self.case_dirs[self.cursor.next_index()]
        return cached_prepare_training_case(
            d, self.canvas, downsample=self.downsample,
            cache_dir=self.prep_cache_dir,
        )

    def _build_initial(self) -> None:
        per_dev: List[Dict[str, List[np.ndarray]]] = []
        for _ in self.devices:
            bufs = {"image": [], "seg": [], "fg": []}
            for _ in range(self.k_local):
                c = self._load_next()
                for k in bufs:
                    bufs[k].append(c[k])
            per_dev.append(bufs)
        for name in ("image", "seg", "fg"):
            self._shards[name] = [
                [
                    jax.device_put(arr, dev)
                    for arr in per_dev[i][name]
                ]
                for i, dev in enumerate(self.devices)
            ]
        self._assemble()

    def _assemble(self, only_device: Optional[int] = None) -> None:
        """Build global sharded arrays from per-device slot buffers.

        ``only_device`` restacks just that device's shard (the slot-refresh
        path) and reuses the cached stacks for every other device — a
        refresh moves one case, not the whole pool."""
        import jax.numpy as jnp

        if not hasattr(self, "_stacked"):
            self._stacked = {n: [None] * len(self.devices) for n in
                             ("image", "seg", "fg")}
        arrays = {}
        for name in ("image", "seg", "fg"):
            sample = self._shards[name][0][0]
            global_shape = (self.k_global,) + sample.shape
            sharding = NamedSharding(self.env.mesh, P(DATA_AXIS))
            for i, dev in enumerate(self.devices):
                if self._stacked[name][i] is None or only_device in (None, i):
                    self._stacked[name][i] = jax.device_put(
                        jnp.stack(self._shards[name][i]), dev
                    )
            arrays[name] = jax.make_array_from_single_device_arrays(
                global_shape, sharding, list(self._stacked[name])
            )
        self.image, self.seg, self.fg = (
            arrays["image"],
            arrays["seg"],
            arrays["fg"],
        )

    # -- background refresh ------------------------------------------------
    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            # drain so the worker can observe the stop flag
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=10)
            self._thread = None

    def _worker(self) -> None:
        """Background refresh. An unreadable case is LOGGED (once per dir)
        and skipped — never silently, and never in a busy-spin: consecutive
        failures back off, and a full failing pass over the dataset stops
        the worker loudly (training continues on the current pool rather
        than starving the 1-core host with a 100%-CPU retry loop)."""
        consecutive = 0
        while not self._stop.is_set():
            d = self.case_dirs[self.cursor.next_index()]
            try:
                c = cached_prepare_training_case(
                    d, self.canvas, downsample=self.downsample,
                    cache_dir=self.prep_cache_dir,
                )
                consecutive = 0
            except Exception as e:  # noqa: BLE001 — report + skip below
                consecutive += 1
                if d not in self._warned:
                    self._warned.add(d)
                    print(
                        f"[pool] refresh skipping unreadable case {d}: "
                        f"{type(e).__name__}: {e}",
                        file=sys.stderr, flush=True,
                    )
                if consecutive >= max(len(self.case_dirs), 4):
                    print(
                        "[pool] every case failed to load; stopping the "
                        "refresh worker (training continues on the "
                        "current device pool)",
                        file=sys.stderr, flush=True,
                    )
                    return
                self._stop.wait(0.5)  # backoff; do not spin the host core
                continue
            while not self._stop.is_set():
                try:
                    self._queue.put(c, timeout=0.5)
                    break
                except queue.Full:
                    pass

    def maybe_refresh(self) -> bool:
        """Swap one pool slot with a prepared case, if one is ready.

        Round-robins over (device, slot); non-blocking — if the host hasn't
        finished decoding the next case, training continues on the current
        pool (the device never waits for the host).
        """
        try:
            c = self._queue.get_nowait()
        except queue.Empty:
            return False
        dev_i = self._slot % len(self.devices)
        slot_i = (self._slot // len(self.devices)) % self.k_local
        self._slot += 1
        dev = self.devices[dev_i]
        for name in ("image", "seg", "fg"):
            self._shards[name][dev_i][slot_i] = jax.device_put(c[name], dev)
        self._assemble(only_device=dev_i)
        return True

    def state(self):
        return self.cursor.state()

    def load_state(self, s) -> None:
        self.cursor.load_state(s)
