"""Round-5 measurement for VERDICT r4 #6: does the staged serve warmup
(answer the first queued case as soon as the PRIMARY program is warm,
defer the paired/probs arms) actually cut the post-recycle first-answer
latency vs warming everything up front?

Scenario: a supervisor just recycled the daemon while a case sat queued —
modeled as a FRESH serve child (cold jit, real chip) started over a watch
root that already holds one flagship case, with --warmup --save-probs
(the QA-artifact daemon: its warmup set is label program + probs program,
so the deferred 'rest' arm is a full flagship compile, not a no-op).

Arms (one fresh child process each; the tunnel cannot reuse executables
across processes, so each pays its own cold compiles):
  staged: shipped default — primary warms, case is answered, probs arm
          compiles afterwards (Server._finish_warmup_rest)
  full:   pre-round-5 behavior, restored by patching Server.warmup in the
          child (primary->all, rest->no-op) — the case waits for BOTH
          programs

Metrics per arm: child start -> first _pred.nii.gz (first-answer), the
child's own warmup prints (primary / deferred-rest walls), and mask+probs
parity across arms. The within-arm deferred-rest wall is the same-weather
counterfactual saving (single-shot tunnel compiles are weather-exposed,
so the cross-arm delta is read alongside it, as in the round-4 warmup
entry).

Results -> PERF.md round 5 "staged warmup A/B".
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import re
import shutil
import subprocess
import tempfile
import time


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


FULL_WARMUP_SHIM = """\
import sys
import brats2019_tpu.cli.serve as S

_orig = S.Server.warmup

def full_warmup(self, stage="all"):
    # pre-round-5 behavior: everything compiles before the loop starts
    if stage == "primary":
        stage = "all"
    elif stage == "rest":
        return 0.0
    return _orig(self, stage)

S.Server.warmup = full_warmup
raise SystemExit(S.main(sys.argv[1:]))
"""


def make_workdir(tmp):
    import jax
    import jax.numpy as jnp

    from brats2019_tpu.configs import get_preset
    from brats2019_tpu.models import UNet3D
    from brats2019_tpu.train.checkpoint import export_params

    exp = get_preset("cascade")
    workdir = _os.path.join(tmp, "run")
    for stage, cfg, seed in (("fine", exp.unet, 0),
                             ("coarse", exp.coarse_unet, 1)):
        params = UNet3D(cfg).init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 4))
        )
        d = _os.path.join(workdir, stage)
        _os.makedirs(d, exist_ok=True)
        export_params(_os.path.join(d, "params.npz"), params)
    return workdir


def run_arm(arm, tmp, workdir, staged_case, shape, timeout=1800):
    """One fresh daemon over a watch root that already holds the case."""
    watch = _os.path.join(tmp, f"watch_{arm}")
    out = _os.path.join(tmp, f"out_{arm}")
    _os.makedirs(watch)
    _os.makedirs(out)
    name = f"BraTS19_RECYCLE_{arm}"
    dst = _os.path.join(watch, name)
    _os.makedirs(dst)
    src_name = _os.path.basename(staged_case)
    for f in _os.listdir(staged_case):
        shutil.copyfile(_os.path.join(staged_case, f),
                        _os.path.join(dst, f.replace(src_name, name)))

    argv = [watch, "--preset", "cascade", "--workdir", workdir,
            "--output-dir", out, "--poll", "0.2", "--warmup",
            "--save-probs"]
    if arm == "full":
        cmd = [_sys.executable, "-c", FULL_WARMUP_SHIM, *argv]
    else:
        cmd = [_sys.executable, "-m", "brats2019_tpu.cli.serve", *argv]
    log(f"arm {arm}: starting fresh daemon (cold jit) ...")
    log_path = _os.path.join(tmp, f"serve_{arm}.log")
    t0 = time.time()
    with open(log_path, "w") as lf:
        proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                cwd="/root/repo")
        pred_path = _os.path.join(out, f"{name}_pred.nii.gz")
        probs_path = _os.path.join(out, f"{name}_probs.npz")
        first_answer = None
        deadline = t0 + timeout
        try:
            while time.time() < deadline:
                if first_answer is None and _os.path.exists(pred_path):
                    first_answer = time.time() - t0
                    log(f"  first answer at {first_answer:.1f}s")
                if first_answer is not None and _os.path.exists(probs_path):
                    # give the deferred-rest print a moment to flush
                    time.sleep(3.0)
                    break
                time.sleep(0.2)
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
    assert first_answer is not None, f"arm {arm}: no answer in {timeout}s"
    text = open(log_path).read()
    m_primary = re.search(r"warmup \(primary program\) done in ([\d.]+)s",
                          text)
    m_rest = re.search(r"deferred warmup .* done in ([\d.]+)s", text)
    return {
        "first_answer_s": round(first_answer, 1),
        "primary_warmup_s": float(m_primary.group(1)) if m_primary else None,
        "deferred_rest_s": float(m_rest.group(1)) if m_rest else None,
        "pred_path": pred_path,
        "probs_path": probs_path if _os.path.exists(probs_path) else None,
    }


def main(shape=(240, 240, 155)):
    import numpy as np

    from brats2019_tpu.data.synthetic import write_case
    from brats2019_tpu.utils.nifti import read_nifti

    tmp = tempfile.mkdtemp(prefix="exp_staged_warmup_")
    try:
        workdir = make_workdir(tmp)
        staged = _os.path.join(tmp, "staging", "case0")
        log("staging the queued flagship case ...")
        write_case(staged, seed=7, shape=shape, with_seg=False)

        results = {}
        for arm in ("staged", "full"):
            results[arm] = run_arm(arm, tmp, workdir, staged, shape)
            log(f"  {arm}: {json.dumps({k: v for k, v in results[arm].items() if not k.endswith('_path')})}")

        a = read_nifti(results["staged"]["pred_path"])[0]
        b = read_nifti(results["full"]["pred_path"])[0]
        assert np.array_equal(a, b), "mask mismatch between arms"
        parity = "masks bitwise identical"
        if results["staged"]["probs_path"] and results["full"]["probs_path"]:
            pa = np.load(results["staged"]["probs_path"])["probs"]
            pb = np.load(results["full"]["probs_path"])["probs"]
            assert np.array_equal(pa, pb), "probs mismatch between arms"
            parity += "; probs bitwise identical"
        log(f"parity: {parity}")

        log("")
        log("| arm | primary warmup | deferred rest | first answer "
            "(spawn -> pred) |")
        log("|---|---|---|---|")
        for arm in ("staged", "full"):
            r = results[arm]
            rest = (f"{r['deferred_rest_s']:.1f}s"
                    if r["deferred_rest_s"] is not None else "—")
            log(f"| {arm} | {r['primary_warmup_s']:.1f}s | {rest} | "
                f"**{r['first_answer_s']:.1f}s** |")
        print(json.dumps(
            {a_: {k: v for k, v in r.items() if not k.endswith("_path")}
             for a_, r in results.items()},
            indent=1,
        ))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(240, 240, 155))
    a = ap.parse_args()
    raise SystemExit(main(tuple(a.shape)))
