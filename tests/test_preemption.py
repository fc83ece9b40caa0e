"""Graceful preemption: SIGTERM -> finish step -> checkpoint -> clean exit.

Beyond the reference (its only recovery is resume from the last periodic
checkpoint): TPU pod preemption delivers SIGTERM; the training tools must
write checkpoint_preempt.msgpack carrying the CURRENT epoch and exit 0 so
an orchestrator can simply relaunch with CHECKPOINT.RESUME pointed at it.
"""

import glob
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "tools/train_video_contrast_dis.py",
         "--config_file", "configs/smoke_simsiam.yaml",
         "SOLVER.MAX_EPOCHS", "50",
         "CHECKPOINT.CHECKNAME", "preempt_test"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)

    # wait for the first completed step, then deliver the preemption signal
    lines, deadline = [], time.time() + 560
    try:
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("Epoch: [0]["):
                proc.send_signal(signal.SIGTERM)
                break
            assert time.time() < deadline, "".join(lines[-20:])
        else:
            pytest.fail("tool exited before its first step:\n"
                        + "".join(lines[-20:]))
        rest, _ = proc.communicate(timeout=240)
        lines.append(rest)
    finally:
        if proc.poll() is None:
            proc.kill()

    out = "".join(lines)
    assert proc.returncode == 0, out[-2000:]
    assert "Preemption Checkpoint" in out, out[-2000:]

    exps = sorted(glob.glob(os.path.join(
        REPO, "run", "synthetic", "preempt_test", "experiment_*")))
    assert exps, out[-1000:]
    ckpt = os.path.join(exps[-1], "checkpoint_preempt.msgpack")
    assert os.path.exists(ckpt)

    # meta must carry the interrupted epoch so resume restarts it
    from video_graph_ssl_tpu.utils import load_params_only

    _, meta = load_params_only(ckpt)
    assert int(meta["epoch"]) == 0
