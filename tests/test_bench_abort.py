"""bench.py watchdog abort contract.

The driver records bench.py's last stdout JSON line every round.  When the
axon relay is unresponsive (compiles hang while device probes answer — the
observed r3/r5 degradation mode), the watchdog must still emit ONE
parseable JSON line that says NOTHING was measured (``value`` null, an
``error`` string) rather than exiting silently, so the round record is
self-describing.  The success path's contract (numeric value, vs_baseline)
is exercised by the driver itself and the verify-skill CPU run.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_watchdog_abort_emits_parseable_null_record():
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # Fires during/just after `import jax`, long before any compile.
    env["VGS_BENCH_TIMEOUT"] = "1"
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 3, proc.stderr
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout  # exactly ONE stdout line
    record = json.loads(lines[0])
    assert record["metric"] == "gca_pretrain_clips_per_sec_per_chip"
    assert record["value"] is None
    assert record["vs_baseline"] is None
    assert "relay" in record["error"]
    stale = record["last_healthy_committed_capture"]
    assert stale["not_measured_this_run"] is True
    assert stale["gca_clips_per_sec"] > 0
    assert "watchdog" in proc.stderr
