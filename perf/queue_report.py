#!/usr/bin/env python
"""Summarize a chip-queue ledger and recommend default flips.

Reads the JSONL that perf/chip_queue.sh appends (one {"tag", "result"|
"error"} line per bench trial), prints a sorted table with deltas vs the
baseline trial, and names the winning exact-math knob combination — the
candidate for the headline `python bench.py` defaults.

Usage:  python perf/queue_report.py [perf/CHIP_QUEUE_r03b.jsonl]
(no TPU needed — pure ledger post-processing)
"""

from __future__ import annotations

import json
import sys

KNOBS = {
    "remat": "TPU.REMAT True",
    "remat_convsaved": "TPU.REMAT True TPU.REMAT_POLICY conv_saved",
    "pack_pointwise": "TPU.PACK_POINTWISE True",
    "remat_pack": "TPU.REMAT True TPU.PACK_POINTWISE True",
    "sepconv_nogrid": "TPU.SEPCONV_FUSED True (+VGS_SEPCONV_NOGRID=1)",
    "sepconv_fused": "TPU.SEPCONV_FUSED True",
    "sepconv_xla": "TPU.SEPCONV_FUSED True (+VGS_SEPCONV_XLA=1)",
    "sepconv_pack": "TPU.SEPCONV_FUSED True TPU.PACK_POINTWISE True",
    "bs160": "(batch experiment — not a config default)",
    "bs192": "(batch experiment — not a config default)",
}


def main(path="perf/CHIP_QUEUE_r03b.jsonl"):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))

    results = {}
    for r in rows:
        if "tag" in r and isinstance(r.get("result"), dict):
            results[r["tag"]] = float(r["result"]["value"])
        elif "tag" in r:
            print(f"  !! {r['tag']}: {r.get('error')}")
        else:
            # Narrative ledger rows ({"trial": ..., "verdict": ...} — the
            # r04/r05 measured-verdict style) have no bench value to
            # tabulate; surface them as notes instead of crashing.
            name = r.get("trial", r.get("name", "?"))
            verdict = str(r.get("verdict") or r.get("note")
                          or r.get("result") or "")
            first = verdict.split(". ")[0][:100]
            print(f"  -- {name}: {first}")
    if "baseline" not in results:
        print("no baseline trial in the ledger — nothing to compare "
              "(narrative-verdict ledgers carry their numbers in the "
              "verdict text above)")
        return 0

    base = results["baseline"]
    print(f"\n{'trial':<18}{'clips/s':>10}{'vs base':>9}   knobs")
    for tag, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{tag:<18}{v:>10.1f}{v / base:>8.3f}x   {KNOBS.get(tag, '')}")

    configurable = {t: v for t, v in results.items()
                    if not t.startswith("bs") and t != "baseline"}
    if configurable:
        best_tag, best_v = max(configurable.items(), key=lambda kv: kv[1])
        gain = (best_v - base) / base
        print(f"\nbest configurable: {best_tag} "
              f"({best_v:.1f} clips/s, {gain:+.1%} vs baseline)")
        if gain > 0.02:
            print(f"-> flip defaults to: {KNOBS[best_tag]} "
                  "(exact-math knob; re-run bare `python bench.py` to "
                  "confirm the headline capture)")
        else:
            print("-> within noise (<2%): keep exact-parity defaults off")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
