"""Graceful preemption (SIGTERM mid-training): a resumable checkpoint is
saved at the interrupted step, the CLI exits with the distinct code 3,
and a rerun continues from that step. Complements the SIGKILL
fault-injection test (hard kill -> resume from the last CADENCE
checkpoint); SIGTERM is the advance warning TPU pools send."""

import os
import signal

import pytest

from brats2019_tpu.cli import train as cli_train
from brats2019_tpu.utils.logging import MetricsLogger


def test_train_experiment_stops_after_preempted_coarse(monkeypatch):
    """A preempted coarse stage must not start the fine stage."""
    import brats2019_tpu.train.loop as loop

    calls = []

    def fake_stage(exp, dirs, *, stage, **kw):
        calls.append(stage)
        return loop.StageResult(
            params=None, final_metrics={}, workdir="w", preempted=True
        )

    monkeypatch.setattr(loop, "train_stage", fake_stage)
    monkeypatch.setattr(loop, "make_mesh", lambda: None)
    from brats2019_tpu.configs.presets import get_preset

    res = loop.train_experiment(get_preset("cascade"), ["c1"])
    assert calls == ["coarse"]
    assert res["coarse"].preempted and "fine" not in res


@pytest.mark.slow
def test_sigterm_saves_and_resumes(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "data")
    workdir = str(tmp_path / "run")

    # deterministic injection: raise SIGTERM in the main thread from the
    # FIRST train-metrics log call (log_every=1 -> after step 1, with the
    # loop's handler installed) — no sleep races
    orig_log = MetricsLogger.log
    fired = []

    def patched(self, step, metrics, prefix=""):
        orig_log(self, step, metrics, prefix=prefix)
        if not fired and prefix == "":
            fired.append(step)
            os.kill(os.getpid(), signal.SIGTERM)

    monkeypatch.setattr(MetricsLogger, "log", patched)
    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape",
        "32", "32", "32", "--preset", "unit", "--steps", "1000",
        "--checkpoint-every", "500", "--log-every", "1",
        "--workdir", workdir, "--stage", "fine",
    ])
    out = capsys.readouterr().out
    assert rc == 3
    assert "SIGTERM at step 1" in out and "PREEMPTED" in out
    # the handler was restored on exit
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler
    ) or callable(signal.getsignal(signal.SIGTERM))

    # rerun (no injection): resumes from the preempt checkpoint, finishes
    monkeypatch.setattr(MetricsLogger, "log", orig_log)
    rc = cli_train.main([
        "--data", data, "--preset", "unit", "--steps", "3",
        "--checkpoint-every", "500", "--workdir", workdir,
        "--stage", "fine",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "resumed from step 1" in out
    assert "stage fine done" in out
