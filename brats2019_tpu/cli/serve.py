"""``serve`` — long-running prediction daemon (production serving surface).

Usage:
    python -m brats2019_tpu.cli.serve <watch_root> [--preset cascade]
        [--workdir DIR] [--output-dir DIR] [--poll 0.5] [--once]

Watches ``watch_root`` for BraTS case directories appearing (all four
modality files present and size-stable across one poll interval), runs the
pipelined predictor on each arrival batch — NIfTI decode, host->device
transfer, the compiled cascade+TTA program, and postprocess/write all
overlap (infer/predictor.py) — and writes ``<case>_pred.nii.gz`` plus one
JSONL completion record per case to ``<output-dir>/serve_log.jsonl``.

The reference has no serving story beyond one-shot ``predict`` (SURVEY.md
C17); this is the TPU-deployment counterpart: params stay committed on
device across requests (no reload, no recompile), new work is picked up
within one poll interval, and SIGTERM/SIGINT drain in-flight cases before
exit. ``--once`` processes what is present and exits (used by tests and
batch jobs).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import queue
import signal
import sys
import threading
import time
from typing import Optional

from ..configs.presets import PRESETS
from ..data.case import discover_cases, modality_paths
from .common import (
    load_ensemble_members,
    load_serving_params,
    load_stage_params,
    multichip_mode_notes,
    parse_shard,
    resolve_experiment,
    shard_of,
)

# Canonical absl/XLA status codes that mark a RUNTIME hiccup of the device
# or its transport, not a defect of the case being served. A quarantine
# decision keys on the exception TYPE first (only device-runtime errors can
# be transient — a NIfTI parse error or shape assert is always the case's
# fault) and then on the status-code prefix XlaRuntimeError messages carry.
_TRANSIENT_STATUS = {
    "RESOURCE_EXHAUSTED", "INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED",
    "ABORTED", "CANCELLED", "UNKNOWN",
}


def _is_stale_executable_error(e: BaseException) -> bool:
    """jaxlib's pjit layer can bind a jitted call to a stale executable
    after an exception unwinds through a pipelined batch with async work
    still in flight: the SAME call with inputs identical to a previously
    successful one then fails with a plain ValueError 'INVALID_ARGUMENT:
    Execution supplied N buffers but compiled program expected M buffers'
    (deterministic repro: tests/test_serve.py quarantine test — healthy
    case after a poison-aborted batch, second Predictor in the process).
    That is damage to the process's jit-cache state, NOT a defect of the
    case being served; ``jax.clear_caches()`` + recompile recovers it
    completely. The free-text match is unavoidable here — the error is a
    plain ValueError with no structured status object."""
    return (
        isinstance(e, ValueError)
        and "buffers but compiled program expected" in str(e)
    )


def classify_failure(e: BaseException) -> str:
    """'transient' (device/runtime hiccup — retry, never quarantine) or
    'permanent' (the case's fault — quarantine)."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:  # older jaxlib spelling
        from jax._src.lib import xla_client

        JaxRuntimeError = xla_client.XlaRuntimeError  # type: ignore
    if isinstance(e, (ConnectionError, TimeoutError)):
        return "transient"
    if _is_stale_executable_error(e):
        return "transient"  # recoverable via clear_caches, see above
    if isinstance(e, JaxRuntimeError):
        # XlaRuntimeError carries the canonical status as the first token
        # of its message ("RESOURCE_EXHAUSTED: ..."); there is no richer
        # structured field on the Python side, but keying the *prefix* of
        # a type-checked runtime error is stable across jaxlib rewordings
        # of the free-text part (VERDICT round-2 weak #5)
        status = str(e).split(":", 1)[0].strip().upper()
        return "transient" if status in _TRANSIENT_STATUS else "permanent"
    return "permanent"


def build_parser() -> argparse.ArgumentParser:
    # allow_abbrev=False: the --supervise child is re-invoked with the raw
    # argv minus the supervisor flags, stripped by NAME — an abbreviated
    # `--superv` would parse as --supervise but dodge the strip and spawn
    # supervisors recursively. No abbreviations, no ambiguity.
    p = argparse.ArgumentParser(prog="brats2019_tpu.serve",
                                description=__doc__, allow_abbrev=False)
    p.add_argument("watch_root", help="directory where case dirs appear")
    p.add_argument("--preset", default="cascade", choices=sorted(PRESETS))
    p.add_argument("--workdir", default=None)
    p.add_argument("--output-dir", default=None,
                   help="write predictions+log here instead of the case dirs")
    p.add_argument("--poll", type=float, default=0.5,
                   help="seconds between watch-root scans")
    p.add_argument("--once", action="store_true",
                   help="drain current cases and exit")
    p.add_argument("--no-tta", action="store_true")
    p.add_argument("--no-cascade", action="store_true")
    p.add_argument("--transfer-dtype", default=None,
                   choices=("bfloat16", "int8"),
                   help="host->device encoding: int8 halves link bytes "
                        "(lossy, ~99.999%% mask agreement; PERF.md)")
    p.add_argument("--postproc", default="device",
                   choices=("host", "device"),
                   help="where C16 connected-components runs. serve "
                        "defaults to DEVICE (host-free): the round-3 "
                        "two-phase CC costs ~17 ms on-device vs ~108 ms "
                        "host scipy, and the 1-core serving host is the "
                        "throughput wall (PERF.md round 3)")
    p.add_argument("--min-component-voxels", type=int, default=None,
                   help="override the preset's C16 small-component filter "
                        "(0 disables); measured benefit: docs/ACCURACY.md")
    p.add_argument("--et-min-voxels", type=int, default=None,
                   help="override the preset's empty-ET relabel threshold "
                        "(tiny ET -> NCR; 0 disables). The largest "
                        "measured accuracy lever on the hard benchmark: "
                        "+0.17-0.33 ET Dice (docs/ACCURACY.md)")
    p.add_argument("--prep-cache", default=None, metavar="DIR",
                   help="on-disk transfer-payload cache: repeat arrivals "
                        "of the same case files skip NIfTI gzip decode + "
                        "brain-bbox scan + crop/cast (payload is bitwise "
                        "what the uncached path ships; VERDICT r3 #5)")
    p.add_argument("--serving-depth", type=int, default=None,
                   help="volumes concurrently in host prep/postprocess "
                        "(>1 hedges transfer stalls on bad links)")
    p.add_argument("--rss-limit-mb", type=int, default=0,
                   help="voluntary recycle watermark: exit with code 4 "
                        "(between batches, never mid-case) once resident "
                        "memory crosses this, so a supervisor restarts the "
                        "daemon — lossless via the completion-log replay. "
                        "Needed on the axon IFRT tunnel, which leaks ~37 MB "
                        "host-side per transferred volume (PERF.md round-4 "
                        "soak); 0 = off")
    p.add_argument("--multichip", default=None,
                   choices=("spatial", "sweep", "cascade"),
                   help="serve each case over a mesh of ALL local devices "
                        "instead of round-robin striping cases across "
                        "them (latency-optimal daemon; throughput favors "
                        "the default striping). 'cascade' produces the "
                        "flagship predictor's masks; 'spatial'/'sweep' "
                        "are the single-stage decompositions (accuracy "
                        "table: docs/MULTIHOST.md). --ensemble composes "
                        "with cascade mode (one mesh program runs every "
                        "member's sweep); --save-probs/--save-uncertainty "
                        "do not compose with --multichip")
    p.add_argument("--batch-volumes", type=int, default=None, choices=(1, 2),
                   help="2 = pair two volumes' fine TTA stages into one "
                        "b16 device program. Measured neutral since the "
                        "low-res TTA reduce (PERF.md r3 s7); kept "
                        "for completeness. Only pairing (2) is "
                        "implemented")
    p.add_argument("--ensemble", default=None, nargs="+", metavar="WORKDIR",
                   help="checkpoint-ensemble serving: average class "
                        "probabilities over the primary --workdir model "
                        "AND each listed workdir's model (one compiled "
                        "program, M member passes per case; host "
                        "postprocessing)")
    p.add_argument("--save-probs", action="store_true",
                   help="also write <case>_probs.npz per served case "
                        "(one extra device pass per case)")
    p.add_argument("--save-uncertainty", action="store_true",
                   help="also write QU-BraTS uncertainty maps "
                        "<case>_unc_{whole,core,enhance}.nii.gz per "
                        "served case (shares the --save-probs device "
                        "pass when both are on)")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="also expose an HTTP API (GET /healthz /stats "
                        "/result, POST /predict with a case tarball or a "
                        "co-located {'case_dir': ...} JSON) — uploads "
                        "spool into the watch root; device work stays in "
                        "the daemon loop (cli/http_api.py)")
    p.add_argument("--http-host", default="127.0.0.1",
                   help="HTTP bind address (default loopback; front with "
                        "a reverse proxy for anything wider)")
    p.add_argument("--http-token", default=None, metavar="SECRET",
                   help="require 'Authorization: Bearer SECRET' on every "
                        "HTTP endpoint except /healthz")
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="scale-out serving: this daemon handles only the "
                        "cases whose stable name-hash lands in shard I of "
                        "N (e.g. one daemon per host/chip over a shared "
                        "watch root: --shard 0/4 ... --shard 3/4). "
                        "Deterministic and disjoint; each daemon keeps "
                        "its own --output-dir/log")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile AND pre-run the serving device "
                        "programs on a zeros canvas before watching, so "
                        "the first arriving case pays no cold compile. "
                        "Meant for supervisor-restarted daemons on "
                        "tunnel-style plugins, where a flagship cold "
                        "compile is 5-8 min and dominated recycle cost in "
                        "the round-4 soak (PERF.md); /healthz reports "
                        "warm:false until done")
    p.add_argument("--retries", type=int, default=1,
                   help="in-process retries for transient device failures")
    p.add_argument("--retry-backoff", type=float, default=1.0,
                   help="initial retry backoff seconds (doubles per retry)")
    p.add_argument("--supervise", action="store_true",
                   help="run the daemon as a supervised child process and "
                        "restart it on voluntary recycles (exit 4, the "
                        "--rss-limit-mb watermark) and on crashes (capped "
                        "by --max-crash-restarts). The supervisor itself "
                        "never touches the device; pair with --warmup so "
                        "restarted daemons re-compile during idle startup. "
                        "Deliberate exits pass through (0 drained, 2 config "
                        "error); a forwarded SIGTERM/SIGINT always exits 0 "
                        "(clean stop), whatever window it lands in")
    p.add_argument("--max-crash-restarts", type=int, default=3,
                   help="with --supervise: give up after this many "
                        "consecutive UNEXPECTED child exits (recycles via "
                        "exit 4 are always restarted and reset the count)")
    p.add_argument("--seed", type=int, default=None)
    return p


def _strip_supervisor_flags(argv):
    """The child daemon gets the same CLI minus the supervisor-only flags."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == "--supervise" or a.startswith("--max-crash-restarts="):
            continue
        if a == "--max-crash-restarts":
            skip = True
            continue
        out.append(a)
    return out


def supervise_loop(cmd, max_crash_restarts=3, crash_backoff=1.0,
                   _sleep=time.sleep) -> int:
    """Restart policy around one serving daemon (serve --supervise).

    - exit 4 (EXIT_RECYCLE, the --rss-limit-mb watermark): restart
      immediately; the completion-log replay makes it lossless and the
      recycle resets the crash counter (a healthy daemon recycling for
      hours must never exhaust the crash budget).
    - exit 0 / 2 / 3 (drained / config error / deliberate):
      pass through.
    - anything else (crash): restart with doubling backoff, give up after
      ``max_crash_restarts`` consecutive crashes (a poison config must
      not flap forever).

    SIGTERM/SIGINT/SIGHUP are forwarded to the child, so graceful stop and
    weight hot-reload work unchanged through the supervisor. Stop signals
    are STICKY and the resulting exit code is DETERMINISTIC: the serve
    child's own SIGTERM contract is drain-then-exit-0, so a supervisor
    that received a stop exits 0 regardless of whether the signal reached
    a draining child, killed one mid-import (default handler, -15), or
    raced an empty restart window — never dropped, never miscounted as a
    crash-restart, and never a timing-dependent exit code (a child config
    error, exit 2, still passes through)."""
    import subprocess

    child = {"proc": None, "stop": False}

    def forward(signum, _frame):
        if signum != getattr(signal, "SIGHUP", None):
            child["stop"] = True
        p = child["proc"]
        if p is not None and p.poll() is None:
            p.send_signal(signum)

    old = {}
    for s in (signal.SIGTERM, signal.SIGINT) + (
        (signal.SIGHUP,) if hasattr(signal, "SIGHUP") else ()
    ):
        old[s] = signal.signal(s, forward)
    crashes = 0
    try:
        while True:
            if child["stop"]:
                return 0  # stop raced the restart window: clean stop
            t_start = time.monotonic()
            child["proc"] = subprocess.Popen(cmd)
            if child["stop"]:
                # a stop signal that landed between the top-of-loop check
                # and Popen was forwarded to the PREVIOUS (exited) proc or
                # none at all; re-deliver it to the fresh child so the
                # sticky-stop contract holds without a second signal
                try:
                    child["proc"].send_signal(signal.SIGTERM)
                except OSError:
                    pass
            rc = child["proc"].wait()
            uptime = time.monotonic() - t_start
            if child["stop"]:
                # a config error keeps its meaning; anything else (clean
                # drain, killed mid-import, recycle racing the stop) is
                # the deterministic clean-stop contract
                return rc if rc == 2 else 0
            if rc == Server.EXIT_RECYCLE:
                crashes = 0
                # a watermark at/below the daemon's BASELINE RSS recycles
                # after every batch — or, idle, after two empty scans.
                # Busy daemons still make progress (pending work is served
                # before the voluntary exit), but an idle one would spin
                # load-weights/compile loops; pace fast recycles instead
                # of hot-looping
                if uptime < 30.0:
                    print(f"supervise: daemon recycled after only "
                          f"{uptime:.1f}s — --rss-limit-mb is likely at or "
                          "below baseline RSS; pacing restarts (10s)",
                          file=sys.stderr, flush=True)
                    _sleep(10.0)
                else:
                    print("supervise: daemon recycled (exit 4); restarting",
                          flush=True)
                continue
            if rc in (0, 2, 3):
                return rc
            crashes += 1
            if crashes > max_crash_restarts:
                print(f"supervise: giving up after {crashes} consecutive "
                      f"unexpected exits (last rc={rc})", file=sys.stderr,
                      flush=True)
                return rc
            wait = crash_backoff * (2 ** (crashes - 1))
            print(f"supervise: daemon exited rc={rc} (crash {crashes}/"
                  f"{max_crash_restarts}); restarting in {wait:.1f}s",
                  file=sys.stderr, flush=True)
            _sleep(wait)
    finally:
        for s, h in old.items():
            signal.signal(s, h)


def _self_rss_mb() -> float:
    """This process's resident set in MB (Linux /proc; 0.0 where absent —
    the RSS limit then never triggers, which is the safe default)."""
    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except (OSError, ValueError, IndexError):
        pass
    return 0.0


def _case_ready(case_dir: str, sizes: dict) -> bool:
    """All 4 modalities exist and their sizes did not change since the last
    scan (an uploader mid-copy never has a stable size across a poll)."""
    try:
        cur = tuple(os.path.getsize(p) for p in modality_paths(case_dir))
    except OSError:
        return False
    prev = sizes.get(case_dir)
    sizes[case_dir] = cur
    return prev == cur


class Server:
    # class-level defaults so minimally-constructed instances (tests,
    # embedding) get artifact emission OFF without touching __init__
    save_probs = False
    save_uncertainty = False
    # payload prefill off until __init__ proves the predictor supports it
    # (also keeps minimally-constructed instances off the self.exp path)
    _can_prefill = False
    # None = warmup not requested; False = warming; True = warmed
    # (/healthz surfaces this only when not None)
    warm = None

    def __init__(self, exp, output_dir=None, log_dir=None, retries=1,
                 retry_backoff=1.0, ensemble_workdirs=None,
                 save_probs=False, save_uncertainty=False, multichip=None):
        self.save_probs = save_probs
        self.save_uncertainty = save_uncertainty
        exp, params_fine, params_coarse = load_serving_params(exp)
        self.exp = exp
        self.multichip = multichip
        self.ensemble_workdirs = list(ensemble_workdirs or [])
        if multichip:
            # mesh-decomposed daemon (VERDICT r3 missing #4: config-5-style
            # serving): every case runs over ALL local devices through
            # MultichipPredictor, which is a predict_dirs/reload_params
            # drop-in. 'cascade' serves the FLAGSHIP masks; the probs-pass
            # artifacts and ensembling are single-device features (main()
            # rejects those combos before we get here).
            from ..infer.multichip import MultichipPredictor

            members = None
            if ensemble_workdirs:
                # ensemble x mesh composition (cascade mode only — the
                # predictor rejects spatial/sweep): K members' cascade
                # sweeps in ONE mesh program, EnsemblePredictor masks
                members = load_ensemble_members(
                    exp, ensemble_workdirs, (params_fine, params_coarse)
                )
            # operator notes (postproc-on-host etc.) are printed by the
            # CLI via common.multichip_mode_notes; masks are identical
            # either way
            self.predictor = MultichipPredictor(
                exp, params_fine, mode=multichip,
                params_coarse=params_coarse, members=members,
            )
            print(f"serve: multichip mode={multichip} over "
                  f"{self.predictor.env.n_data} devices"
                  + (f", ensemble of {self.predictor.num_members} members"
                     if members else ""), flush=True)
        elif ensemble_workdirs:
            from ..infer.ensemble import EnsemblePredictor

            members = load_ensemble_members(
                exp, ensemble_workdirs, (params_fine, params_coarse)
            )
            if exp.infer.postproc == "device":
                print("serve: --ensemble postprocesses on the host (the "
                      "in-graph device CC lives in the label program, "
                      "which the ensemble's probability path bypasses)",
                      file=sys.stderr)
            self.predictor = EnsemblePredictor(exp, members)
            print(f"serve: ensemble of {self.predictor.num_members} "
                  f"members", flush=True)
        else:
            from ..infer.predictor import Predictor

            self.predictor = Predictor(exp, params_fine, params_coarse)
        self.output_dir = output_dir
        self.retries = retries
        self.retry_backoff = retry_backoff
        # log + heartbeat live in a location that is stable across daemon
        # restarts from any CWD (ADVICE round 2): output_dir if given, else
        # an explicit log_dir (main() passes the watch root)
        self.log_dir = output_dir or log_dir or "."
        self.log_path = os.path.join(self.log_dir, "serve_log.jsonl")
        for d in (output_dir, self.log_dir):
            if d:
                os.makedirs(d, exist_ok=True)
        self.done = self._load_done()
        self._stop = False
        self._reload = False
        # scale-out: (i, n) or None — scan() skips cases outside shard i
        self.shard = None
        # completion records of THIS process, for the HTTP API
        # (cli/http_api.py): case name -> latest JSONL record. Guarded by
        # results_cv; wait_result blocks HTTP threads on it
        self.started_ts = time.time()
        self.results: dict = {}
        self.results_cv = threading.Condition()
        # MONOTONIC completion counters for /metrics (Prometheus counters
        # must never decrease; the latest-record dict can, when a served
        # case is later resubmitted and fails)
        self.counters = {"served": 0, "quarantined": 0, "prefilled": 0}
        # payload-cache prefill (VERDICT round-4 #5): arrivals queued
        # behind the current batch get decoded+encoded into the on-disk
        # payload cache by a background thread while the device serves,
        # so their serve-time prep is a warm hit. Active only when the
        # predictor exposes the prefill (single-device/ensemble paths
        # with --prep-cache; multichip prep doesn't use the payload
        # cache).
        self._prefill_q: "queue.Queue[str]" = queue.Queue()
        self._prefill_queued: set = set()
        self._prefill_thread: Optional[threading.Thread] = None
        self._can_prefill = bool(
            getattr(self.exp.infer, "prep_cache_dir", None)
            and hasattr(self.predictor, "prefill_payload_cache")
        )

    def _queue_prefill(self, case_dirs) -> None:
        """Enqueue not-yet-seen cases for background payload prefill and
        lazily start the worker."""
        if not self._can_prefill or not case_dirs:
            return
        if self._prefill_thread is None:
            self._prefill_thread = threading.Thread(
                target=self._prefill_worker, daemon=True
            )
            self._prefill_thread.start()
        for d in case_dirs:
            if d not in self._prefill_queued:
                self._prefill_queued.add(d)
                self._prefill_q.put(d)

    def _prefill_worker(self) -> None:
        """Drain the prefill queue on the poll-loop's idle core time: pure
        host work (gzip decode + bbox + crop/cast + atomic cache write),
        never the device. Failures are logged and left for the serving
        path's own retry/quarantine machinery — prefill is an
        optimization, not a gate."""
        while not self._stop:
            try:
                d = self._prefill_q.get(timeout=0.5)
            except queue.Empty:
                continue
            try:
                if self.predictor.prefill_payload_cache(d):
                    self.counters["prefilled"] += 1
                    print(f"serve: prefilled payload cache for "
                          f"{os.path.basename(d)}", flush=True)
            except Exception as e:  # noqa: BLE001 — serve path will retry
                print(f"serve: payload prefill failed for {d}: "
                      f"{type(e).__name__}: {e}", file=sys.stderr,
                      flush=True)

    def _load_done(self) -> set:
        """Replay the completion log so a restarted daemon skips served and
        permanently-quarantined cases (a poison case must never crash-loop)
        — but RE-TRIES cases whose failure was classified transient: a
        device hiccup that outlived the in-process retries must not
        permanently quarantine a healthy case (ADVICE round 2)."""
        done = set()
        try:
            with open(self.log_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                        case = rec["case"]
                    except (ValueError, KeyError):
                        continue
                    if rec.get("error") is None or (
                        rec.get("error_class", "permanent") == "permanent"
                    ):
                        done.add(case)
                    else:
                        done.discard(case)  # transient: retry on restart
        except OSError:
            pass
        return done

    def request_stop(self, *_):
        self._stop = True

    def request_reload(self, *_):
        """SIGHUP: hot-reload weights at the next loop iteration."""
        self._reload = True

    def reload_weights(self) -> bool:
        """Swap serving weights from the workdir (freshly exported params
        or a newer checkpoint) with ZERO recompiles — params are traced
        args of the live executables (Predictor.reload_params). A failed
        reload keeps the current weights serving."""
        try:
            pf = load_stage_params(self.exp, "fine")
            pc = None
            if self.exp.infer.cascade and self.exp.coarse_unet is not None:
                pc = load_stage_params(self.exp, "coarse")
            if self.ensemble_workdirs:
                members = load_ensemble_members(
                    self.exp, self.ensemble_workdirs, (pf, pc)
                )
                self.predictor.reload_members(members)
                print(f"serve: {len(members)} ensemble members "
                      "hot-reloaded (SIGHUP)", flush=True)
            else:
                self.predictor.reload_params(pf, pc)
                print("serve: weights hot-reloaded (SIGHUP)", flush=True)
            return True
        except Exception as e:  # noqa: BLE001 — keep serving on failure
            print(f"serve: weight reload FAILED, keeping current weights: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
            return False

    def warmup(self, stage: str = "all") -> float:
        """Pre-compile + pre-run the serving device programs on a zeros
        canvas (--warmup; rationale: Predictor.warmup). Warms the probs
        program too when this daemon emits QA artifacts.

        Staged startup (VERDICT round-4 #6, the recycle-tax lever): the
        CLI warms ``stage="primary"`` — just the program the first queued
        case dispatches — BEFORE entering the watch loop, then the loop
        finishes ``stage="rest"`` (paired-stage, probs arms) after the
        first pending batch is served (or immediately when idle). A
        post-recycle daemon with queued work answers it without waiting
        for program arms that case never runs. Returns wall seconds;
        sets ``self.warm`` for /healthz once the PRIMARY program is warm
        (the daemon can serve from that point)."""
        if stage in ("all", "primary"):
            self.warm = False
        t0 = time.time()
        if self.multichip:
            self.predictor.warmup(stage=stage)
        else:
            self.predictor.warmup(
                probs=bool(self.save_probs or self.save_uncertainty),
                stage=stage,
            )
        if stage in ("all", "primary"):
            self.warm = True
        return time.time() - t0

    def _finish_warmup_rest(self) -> None:
        """Run the deferred non-primary warmup arms once (watch loop)."""
        if not getattr(self, "_warmup_rest_pending", False):
            return
        self._warmup_rest_pending = False
        t = self.warmup(stage="rest")
        if t > 0.05:
            print(f"serve: deferred warmup (paired/probs arms) done in "
                  f"{t:.1f}s", flush=True)

    @property
    def stopping(self) -> bool:
        return self._stop

    def _out_paths(self, case_dirs):
        if not self.output_dir:
            return None
        return [
            os.path.join(self.output_dir, os.path.basename(d) + "_pred.nii.gz")
            for d in case_dirs
        ]

    def _log(self, records) -> None:
        with open(self.log_path, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")

    def process_batch(self, case_dirs) -> list:
        """Run one pipelined batch (predict_dirs — decode/device/write
        overlap across the batch). A failing case is isolated by retrying
        the batch case-by-case; failures are quarantined (logged with an
        ``error`` field, marked done) so one corrupt upload can neither
        kill the daemon nor crash-loop it on restart."""
        # NO in-batch prefill: predict_dirs' own pipelined prep is about
        # to decode every case in this batch, so a background prefill of
        # case_dirs[serving_depth:] duplicates that work and races it for
        # the core — the round-5 burst A/B measured the duplication at
        # 3.5 -> 15 s per-case prep and a 4x burst wall on the 1-core
        # serving host (PERF.md round 5). Queued cases BEYOND this batch
        # are prefilled by the watch loop (run(): ready[8:]).
        t0 = time.time()
        try:
            outs = self.predictor.predict_dirs(
                case_dirs, output_paths=self._out_paths(case_dirs)
            )
            errs = [None] * len(case_dirs)
        except Exception:
            outs, errs = [], []
            for d in case_dirs:  # isolate the poison case
                o, e = self._predict_one_isolated(d)
                outs.append(o)
                errs.append(e)
        wall = time.time() - t0
        records = []
        for d, o, e in zip(case_dirs, outs, errs):
            rec = {
                "case": os.path.basename(d),
                "output": o,
                "batch_size": len(case_dirs),
                "batch_wall_s": round(wall, 3),
                "ts": time.time(),
            }
            if e is not None:
                msg, err_class = e
                rec["error"] = msg
                rec["error_class"] = err_class
                print(
                    f"serve: {'QUARANTINED' if err_class == 'permanent' else 'DEFERRED (transient)'} {d}: {msg}",
                    file=sys.stderr, flush=True,
                )
            records.append(rec)
        self._log(records)
        # served and permanently-quarantined cases are done; a case whose
        # failure outlived the in-process retries but classified TRANSIENT
        # must stay retryable by THIS daemon (the next scan re-picks it at
        # poll cadence) — not just by a restarted one via _load_done's
        # replay (the 'DEFERRED' promise above was previously restart-only)
        self.done.update(
            os.path.basename(d)
            for d, e in zip(case_dirs, errs)
            if e is None or e[1] == "permanent"
        )
        ok = sum(1 for e in errs if e is None)
        print(
            f"serve: {ok}/{len(case_dirs)} case(s) in {wall:.2f}s "
            f"({len(case_dirs) / wall:.3f} vol/s)",
            flush=True,
        )
        # best-effort QA artifacts for the SERVED cases (opt-in; the
        # prediction already succeeded and is logged — an artifact
        # failure must not quarantine or crash)
        if self.save_probs or self.save_uncertainty:
            from .predict import _emit_probs_artifacts

            served = [d for d, e in zip(case_dirs, errs) if e is None]
            for d in served:  # per-case: one failure must not starve the rest
                try:
                    _emit_probs_artifacts(
                        self.predictor, [d], self.save_probs,
                        self.save_uncertainty, output_dir=self.output_dir,
                    )
                except Exception as e:  # noqa: BLE001 — QA is best-effort
                    print(f"serve: artifact pass failed for {d}: {e}",
                          file=sys.stderr, flush=True)
        # publish LAST: an HTTP /predict waiter woken by this must be able
        # to GET /artifact immediately, so the QA artifacts (and the
        # atomically-renamed outputs) have to exist first
        self._publish(records)
        return outs

    def _predict_one_isolated(self, case_dir: str):
        """One case with transient-failure retry: a device/runtime hiccup
        (RESOURCE_EXHAUSTED, UNAVAILABLE, ... — observed transiently on
        shared TPU pools) must not permanently quarantine a healthy case.
        Classification is by exception type + canonical status code
        (classify_failure), not message substrings; retries/backoff come
        from --retries/--retry-backoff. Returns (output, None) on success
        or (None, (message, error_class))."""
        err = None
        for attempt in range(self.retries + 1):
            try:
                return (
                    self.predictor.predict_dirs(
                        [case_dir], output_paths=self._out_paths([case_dir])
                    )[0],
                    None,
                )
            except Exception as e:  # noqa: BLE001 — classify below
                msg = f"{type(e).__name__}: {e}"
                err = (msg, classify_failure(e))
                if err[1] == "transient" and attempt < self.retries:
                    if _is_stale_executable_error(e):
                        # the jit cache itself is damaged (see
                        # _is_stale_executable_error) — a bare retry would
                        # rebind the same stale executable; recompiling is
                        # the recovery
                        import jax

                        print(
                            f"serve: stale jit executable on {case_dir}; "
                            "clearing jax caches and recompiling",
                            file=sys.stderr, flush=True,
                        )
                        jax.clear_caches()
                    backoff = self.retry_backoff * (2 ** attempt)
                    print(
                        f"serve: transient failure on {case_dir}, retrying "
                        f"in {backoff:.1f}s: {msg[:200]}",
                        file=sys.stderr, flush=True,
                    )
                    time.sleep(backoff)
                    continue
                return None, err
        return None, err

    def _publish(self, records) -> None:
        """Make completion records visible to HTTP waiters."""
        with self.results_cv:
            for rec in records:
                self.results[rec["case"]] = rec
                if rec.get("error") is None:
                    self.counters["served"] += 1
                elif rec.get("error_class") == "permanent":
                    self.counters["quarantined"] += 1
            self.results_cv.notify_all()

    def wait_result(self, case: str, timeout: float):
        """Block until ``case`` has a FINAL record — success or permanent
        quarantine; a transient-deferred record is not final (the daemon
        retries the case at poll cadence). On timeout (or daemon stop)
        returns the latest record if any — possibly transient, the caller
        distinguishes via error_class — else None."""

        def final(rec):
            return rec is not None and (
                rec.get("error") is None
                or rec.get("error_class") == "permanent"
            )

        deadline = time.time() + max(timeout, 0.0)
        with self.results_cv:
            while True:
                rec = self.results.get(case)
                if final(rec):
                    return rec
                remaining = deadline - time.time()
                if remaining <= 0 or self._stop:
                    return rec
                self.results_cv.wait(min(remaining, 1.0))

    def _mine(self, case_dir: str) -> bool:
        if self.shard is None:
            return True
        i, n = self.shard
        return shard_of(os.path.basename(case_dir), n) == i

    def scan(self, watch_root: str, sizes: dict) -> list:
        return [
            d
            for d in discover_cases(watch_root)
            if self._mine(d)
            and os.path.basename(d) not in self.done
            and _case_ready(d, sizes)
        ]

    # exit code for a voluntary RSS-limit recycle (distinct from SIGTERM
    # preemption's 3): the supervisor should simply restart the daemon —
    # the completion-log replay makes that lossless
    EXIT_RECYCLE = 4

    def run(self, watch_root: str, poll: float, once: bool) -> int:
        sizes: dict = {}
        if once:
            self.scan(watch_root, sizes)  # prime size table
            time.sleep(poll)  # a mid-upload case must see sizes change
            ready = self.scan(watch_root, sizes)
            if ready:
                self.process_batch(ready)
            return 0
        print(f"serve: watching {watch_root} (poll {poll}s)", flush=True)
        self._last_hb = 0.0
        idle_scans = 0
        while not self._stop:
            if self._reload:
                self._reload = False
                self.reload_weights()
            self._heartbeat(poll)
            ready = self.scan(watch_root, sizes)
            idle_scans = 0 if ready else idle_scans + 1
            if ready:
                # cases beyond the first chunk wait while the device
                # serves it — prefill their payload cache in the
                # background so their prep is a warm hit when their
                # turn comes (VERDICT round-4 #5)
                self._queue_prefill(ready[8:])
                # bounded chunks so the heartbeat stays fresh under a
                # burst — a supervisor must not kill a busy-but-healthy
                # daemon mid-batch (staleness bound ~= 8 x per-case time)
                recycle = False
                for i0 in range(0, len(ready), 8):
                    self.process_batch(ready[i0 : i0 + 8])
                    self._heartbeat(poll)
                    if self._stop:
                        break
                    # between chunks only — pending work in THIS chunk was
                    # served first, so a limit already exceeded at startup
                    # (misconfigured below baseline) still makes progress
                    # on every supervisor restart instead of crash-looping
                    if self._over_rss_limit():
                        recycle = True
                        break
                if recycle:
                    return self.EXIT_RECYCLE
                # queued work answered first; now finish the deferred
                # warmup arms while the queue is empty
                self._finish_warmup_rest()
            else:
                self._finish_warmup_rest()
                # idle recycle only after TWO empty scans: the readiness
                # protocol needs a second sighting before a just-dropped
                # case becomes ready, and pending work must be served
                # before a voluntary exit
                if idle_scans >= 2 and self._over_rss_limit():
                    return self.EXIT_RECYCLE
                time.sleep(poll)
        print("serve: drained, exiting", flush=True)
        return 0

    def _over_rss_limit(self) -> bool:
        """Voluntary recycle watermark (--rss-limit-mb): the axon IFRT
        tunnel leaks every host->device transfer buffer host-side (~37 MB
        per flagship volume — PERF.md round-4 'sustained serving soak';
        jax.live_arrays stays constant, so it is plugin-internal and
        unfix-able repo-side). Long-lived daemons on that plugin must
        self-recycle at a watermark: checked BETWEEN batches only (never
        mid-case), exits EXIT_RECYCLE so a supervisor restarts cleanly —
        served cases replay from the completion log, in-flight HTTP
        waiters see the restart note. 0 = off (co-located PJRT runtimes
        free transfer staging correctly; the limit is for tunnel-style
        plugins)."""
        limit = getattr(self, "rss_limit_mb", 0)
        if not limit:
            return False
        rss = _self_rss_mb()
        if rss < limit:
            return False
        print(f"serve: RSS {rss:.0f} MB >= --rss-limit-mb {limit}; "
              "exiting for supervisor restart (completion log replays, "
              f"exit code {self.EXIT_RECYCLE})", flush=True)
        return True

    def _heartbeat(self, poll: float) -> None:
        now = time.time()
        if now - getattr(self, "_last_hb", 0.0) < max(poll, 5.0):
            return
        hb_path = os.path.join(self.log_dir, "serve_heartbeat.json")
        tmp = hb_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"ts": now, "done": len(self.done)}, f)
        os.replace(tmp, hb_path)
        self._last_hb = now


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.supervise:
        # the supervisor stays device-free (it must survive device-claim
        # failures that kill the child); the child re-enters main() with
        # the same CLI minus the supervisor flags
        src = list(sys.argv[1:]) if argv is None else list(argv)
        cmd = [sys.executable, "-m", "brats2019_tpu.cli.serve",
               *_strip_supervisor_flags(src)]
        return supervise_loop(
            cmd, max_crash_restarts=args.max_crash_restarts
        )
    from ..utils.jax_setup import setup_jax

    setup_jax()
    exp = resolve_experiment(args)
    infer = exp.infer
    if args.no_tta:
        infer = dataclasses.replace(infer, tta_flips=False)
    if args.no_cascade:
        infer = dataclasses.replace(infer, cascade=False)
    if args.transfer_dtype:
        infer = dataclasses.replace(infer, transfer_dtype=args.transfer_dtype)
    if args.postproc:
        infer = dataclasses.replace(infer, postproc=args.postproc)
    if args.serving_depth:
        infer = dataclasses.replace(infer, serving_depth=args.serving_depth)
    if args.prep_cache:
        infer = dataclasses.replace(infer, prep_cache_dir=args.prep_cache)
    if args.batch_volumes:
        infer = dataclasses.replace(infer, batch_volumes=args.batch_volumes)
    exp = dataclasses.replace(exp, infer=infer)

    if args.multichip:
        # the probs pass behind the QA artifacts is a single-device
        # program; refuse loudly instead of serving something other than
        # what the flags promise. --ensemble composes with cascade mode
        # (one mesh program runs every member's sweep); not spatial/sweep
        for flag, name in ((args.save_probs, "--save-probs"),
                           (args.save_uncertainty, "--save-uncertainty")):
            if flag:
                print(f"error: --multichip does not compose with {name}",
                      file=sys.stderr)
                return 2
        if args.ensemble and args.multichip != "cascade":
            print("error: --ensemble composes only with --multichip "
                  "cascade (spatial/sweep are single-stage whole-canvas "
                  "programs)", file=sys.stderr)
            return 2
        multichip_mode_notes(args.multichip, exp,
                             batch_volumes=args.batch_volumes,
                             serving_depth=args.serving_depth)

    try:
        server = Server(
            exp, output_dir=args.output_dir, log_dir=args.watch_root,
            retries=args.retries, retry_backoff=args.retry_backoff,
            ensemble_workdirs=args.ensemble,
            save_probs=args.save_probs,
            save_uncertainty=args.save_uncertainty,
            multichip=args.multichip,
        )
    except (FileNotFoundError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    server.rss_limit_mb = args.rss_limit_mb
    if args.warmup:
        server.warm = False  # /healthz says warm:false from the first reply
    if args.shard:
        try:
            server.shard = parse_shard(args.shard)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(f"serve: shard {server.shard[0]}/{server.shard[1]} of the "
              "watch root", flush=True)
    signal.signal(signal.SIGTERM, server.request_stop)
    signal.signal(signal.SIGINT, server.request_stop)
    if hasattr(signal, "SIGHUP"):
        signal.signal(signal.SIGHUP, server.request_reload)
    httpd = None
    if args.http is not None:
        from .http_api import start_http

        httpd = start_http(server, args.watch_root, args.http,
                           args.http_host, token=args.http_token)
    try:
        if args.warmup:
            # after start_http so /healthz answers (warm:false) during the
            # compile; before the watch loop so the first case is warm.
            # Staged: only the primary (single-volume label) program blocks
            # the loop — a queued case is answered as soon as the program
            # IT dispatches is warm; the paired/probs arms compile after
            # the first batch (Server._finish_warmup_rest)
            print("serve: warming up (compiling serving programs)...",
                  flush=True)
            t = server.warmup(stage="primary")
            print(f"serve: warmup (primary program) done in {t:.1f}s",
                  flush=True)
            server._warmup_rest_pending = True
        return server.run(args.watch_root, args.poll, args.once)
    finally:
        if httpd is not None:
            httpd.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
