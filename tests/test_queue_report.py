"""queue_report handles both chip-ledger generations without crashing.

Two schemas exist in perf/: chip_queue.sh trial rows ({"tag",
"result"|"error"}, r03b/r03c) and narrative measured-verdict rows
({"trial", "verdict"}, r04/r05).  The summarizer must tabulate the
former and surface the latter as notes (it crashed on r05 with a
KeyError before 08-20).
"""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(path):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "perf", "queue_report.py"),
         str(path)],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": ""})


def test_trial_schema_tabulates(tmp_path):
    p = tmp_path / "q.jsonl"
    rows = [
        {"tag": "baseline", "result": {"value": 1000.0}},
        {"tag": "pack_pointwise", "result": {"value": 1012.0}},
        {"tag": "remat", "error": "no json (rc=1)"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = _run(p)
    assert out.returncode == 0, out.stderr
    assert "pack_pointwise" in out.stdout
    assert "1.012x" in out.stdout
    assert "!! remat" in out.stdout


def test_narrative_schema_notes_and_exits_clean(tmp_path):
    p = tmp_path / "q.jsonl"
    rows = [
        {"trial": "gcn_propagate_isolated",
         "verdict": "REFUTED at prod shapes. More detail here."},
        {"trial": "gca_batch_sweep", "verdict": "bs=128 is the GCA peak"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = _run(p)
    assert out.returncode == 0, out.stderr
    assert "gcn_propagate_isolated" in out.stdout
    assert "REFUTED at prod shapes" in out.stdout
    assert "no baseline trial" in out.stdout


def test_committed_ledgers_parse():
    for name in ("CHIP_QUEUE_r03b.jsonl", "CHIP_QUEUE_r04.jsonl",
                 "CHIP_QUEUE_r05.jsonl"):
        out = _run(os.path.join(REPO, "perf", name))
        assert out.returncode == 0, (name, out.stderr)
