"""Fault injection (SURVEY.md §5): SIGKILL a real training process after a
checkpoint lands, restart it, and assert the resumed run reproduces the
uninterrupted run's trajectory — checkpoint atomicity + deterministic
resume, end to end through the CLI."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest


def _cli_cmd(root, log_dir, total_steps):
    over = [
        "data.name=flyingchairs", f"data.root={root}",
        "data.sample_hw=(64,96)", "data.augment.crop_hw=(32,32)",
        "data.augment.photometric=false", "data.eval_batch=2",
        "train.global_batch=2", "train.schedule.milestones=(1000,)",
        f"train.schedule.total_steps={total_steps}",
        "train.summary_interval=1", "train.eval_interval=1000",
        "train.checkpoint_interval=2", "train.eval_limit=2",
        f"train.log_dir={log_dir}", "train.seed=5", "parallel.data=2",
        "model.num_levels=3", "model.output_level=2",
        "model.search_range=2", "model.corr_backend=lax",
        "model.dtype=float32",
    ]
    return [sys.executable, "-m", "pwcnet_tpu.cli", "train"] + over


def _env():
    env = os.environ.copy()
    # A site hook may ignore JAX_PLATFORMS; the CLI honors PWCNET_PLATFORM.
    env["PWCNET_PLATFORM"] = "cpu"
    env["PWCNET_CPU_DEVICES"] = "8"
    env["PWCNET_COMPILE_CACHE"] = os.path.expanduser(
        "~/.cache/jax_pwcnet_tests")
    return env


def _final_metrics(log_dir):
    path = os.path.join(log_dir, "metrics.jsonl")
    with open(path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    return lines[-1]


@pytest.mark.slow
def test_sigkill_and_resume_reproduces_run(chairs_dir, tmp_path):
    log_a = str(tmp_path / "uninterrupted")
    log_b = str(tmp_path / "killed")
    env = _env()

    # Reference: uninterrupted 6-step run.
    out = subprocess.run(_cli_cmd(chairs_dir, log_a, 6), env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]

    # Victim: start, wait for a checkpoint >= step 2, SIGKILL (no cleanup).
    proc = subprocess.Popen(_cli_cmd(chairs_dir, log_b, 6), env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    ckpt_dir = os.path.join(log_b, "ckpt")
    deadline = time.time() + 600
    seen = None
    try:
        while time.time() < deadline:
            if os.path.isdir(ckpt_dir):
                steps = [int(d) for d in os.listdir(ckpt_dir)
                         if d.isdigit()]
                if steps:
                    seen = max(steps)
                    break
            if proc.poll() is not None:
                break
            time.sleep(0.5)
        assert seen is not None, "no checkpoint appeared before timeout"
        # Let the async write finish landing, then kill hard.
        time.sleep(2.0)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    # Restart: must auto-resume from the latest checkpoint and finish.
    out2 = subprocess.run(_cli_cmd(chairs_dir, log_b, 6), env=env,
                          capture_output=True, text=True, timeout=900)
    assert out2.returncode == 0, out2.stderr[-2000:]
    final = json.loads(out2.stdout.strip().splitlines()[-1])
    assert final["step"] == 6

    ref = _final_metrics(log_a)
    got = _final_metrics(log_b)
    assert got["step"] == ref["step"] == 6
    np.testing.assert_allclose(got["loss"], ref["loss"], rtol=1e-4)
    np.testing.assert_allclose(got["train_epe"], ref["train_epe"],
                               rtol=1e-4)
