#!/usr/bin/env python
"""Trace the fused MoCo step with jax.profiler and print top HLO ops.

Parses the dumped .xplane.pb with tensorboard_plugin_profile's hlo_stats
converter — no TensorBoard UI needed.  This is the ground-truth view of
where the 110 ms step goes (per-op isolation labs proved unreliable:
ops fuse differently inside the full program).

Run: python perf/profile_step.py [--variant full|fb_only] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(variant, batch, opts=()):
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.engine import (create_pretrain_state,
                                            make_fused_pretrain_step)
    from video_graph_ssl_tpu.engine.pretrain import (_apply_kwargs,
                                                     moco_logits,
                                                     nce_softmax_loss)
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.parallel import (make_mesh, replicate_state,
                                              shard_batch)

    cfg = CFG.clone()
    cfg.merge_from_file("configs/visual_moco.yaml")
    cfg.DATASET.SOURCE = "synthetic"
    if opts:
        cfg.merge_from_list(list(opts))
    t = int(cfg.INPUT.VIDEO_LENGTH)
    canvas = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))
    base = (int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]))
    mesh = make_mesh((-1,), ("data",))
    model, _ = create_visual_model(cfg)
    example = np.zeros((2, t, *base, 3), np.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=1000)
    state = replicate_state(state, mesh)
    g = np.random.default_rng(0)

    if variant == "full":
        raw = {
            "clips": g.integers(0, 256, (batch, 2, t, *canvas, 3),
                                dtype=np.uint8),
            "label": np.zeros(batch, np.int32),
            "index": np.arange(batch, dtype=np.int32),
        }
        raw = shard_batch(raw, mesh)
        step = jax.jit(make_fused_pretrain_step(cfg, model, tx, n_data=1000))

        def run():
            st, m = step(state, raw, 0.06)
            return m["loss"]
    else:  # fb_only
        xq = jnp.asarray(
            g.standard_normal((batch, t, *base, 3), np.float32) * 0.5)
        feat_const = jnp.asarray(g.standard_normal(
            (batch, int(cfg.CROSS.FEAT_DIM)), np.float32))
        T_ = float(cfg.CONTRAST.NCE_T)

        def fb(st, x):
            def loss_fn(params):
                vv, kw = _apply_kwargs(st, params, st.batch_stats, True)
                feat_q, muts = model.apply(vv, x, **kw)
                logits, labels = moco_logits(feat_q, feat_const,
                                             st.contrast.queue, T_)
                return nce_softmax_loss(logits), muts["batch_stats"]
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            gn = sum(jnp.sum(gg.astype(jnp.float32) ** 2)
                     for gg in jax.tree_util.tree_leaves(grads))
            return loss + gn

        step = jax.jit(fb)

        def run():
            return step(state, xq)

    return run


def chrome_trace_report(tracedir, top, steps=3):
    """Parse the .trace.json.gz chrome trace: per-op and per-family device
    time (the xplane hlo_stats path needs tensorboard_plugin_profile +
    a protoc-compatible tensorflow, broken in this image)."""
    import collections
    import gzip
    import re as _re

    traces = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                       recursive=True)
    ev = []
    for t in traces:
        d = json.load(gzip.open(t))
        ev += [e for e in d.get("traceEvents", [])
               if e.get("ph") == "X" and e.get("dur")
               and not str(e.get("name", "")).startswith("$")
               and "jit_" not in e.get("name", "")
               and "Pjit" not in e.get("name", "")
               and "asarray" not in e.get("name", "")
               and not str(e.get("name", "")).isdigit()]
    per_op = collections.defaultdict(float)
    fam = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in ev:
        per_op[e["name"]] += e["dur"]
        base = _re.sub(r"\.\d+$", "", e["name"])
        fam[base] += e["dur"]
        cnt[base] += 1
    print(f"— per-family device time (/{steps} steps) —")
    for n, t in sorted(fam.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{t / steps / 1e3:9.3f} ms/step x{cnt[n] // steps:5d}  {n}")
    print(f"— top individual ops —")
    for n, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t / steps / 1e3:9.3f} ms/step  {n}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="fb_only")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="config overrides, e.g. --opts TPU.REMAT True")
    args = ap.parse_args()

    import jax

    run = build_step(args.variant, args.batch, args.opts)
    for _ in range(3):
        out = run()
    float(out)

    tracedir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            out = run()
        float(out)

    xplanes = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                        recursive=True)
    print(f"trace: {xplanes}", flush=True)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:                      # broken in some images
        print(f"(hlo_stats converter unavailable: {e}; "
              f"falling back to the chrome trace)", flush=True)
        chrome_trace_report(tracedir, args.top)
        if not args.keep:
            import shutil
            shutil.rmtree(tracedir, ignore_errors=True)
        return

    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # gviz-ish table: {"cols": [...], "rows": [{"c": [{"v": ...}...]}...]}
    cols = [c["label"] for c in rows["cols"]]
    out_rows = []
    for r in rows["rows"]:
        out_rows.append({c: cell.get("v") for c, cell in zip(cols, r["c"])})
    key_time = next((c for c in cols if "self" in c.lower()
                     and "time" in c.lower() and "%" not in c), None)
    out_rows.sort(key=lambda d: -(d.get(key_time) or 0))
    total = sum(d.get(key_time) or 0 for d in out_rows)
    print(f"total self time: {total/1e3:.2f} ms (3 steps)")
    name_c = next((c for c in cols if "expression" in c.lower()
                   or "name" in c.lower()), cols[0])
    cat_c = next((c for c in cols if "category" in c.lower()), None)
    for d in out_rows[:args.top]:
        nm = str(d.get(name_c))[:110]
        cat = str(d.get(cat_c))[:24] if cat_c else ""
        st = (d.get(key_time) or 0) / 1e3
        print(f"{st:9.3f} ms  {cat:24s} {nm}")
    if not args.keep:
        import shutil
        shutil.rmtree(tracedir, ignore_errors=True)


if __name__ == "__main__":
    main()
