#!/usr/bin/env python
"""Roofline floors for the S3D MoCo step backward (no chip needed).

Result (bench geometry, bs=128): FLOP floor ~10 ms, optimistic HBM floor
~12 ms, measured backward ~57 ms. The ~4x gap is NOT one hot op — the
post-fix profile is flat — but distributed small-pass overhead: 56 BN
backwards each carrying two batch-wide stat reductions, 9 concat
cotangent slices, 13 pool backwards, dy dilation for the strided convs,
and fusion-boundary spills. Every LOCAL substitution measured so far
(Pallas pool kernels, fused BN VJP, packed taps, space-to-depth stem)
returned neutral-or-worse because each targets a few ms and pays layout
or fusion penalties. The floors say real headroom exists, but the next
credible lever is structural: whole-branch VMEM megakernels (an entire
inception branch fwd+bwd per pallas_call) or sharding the views axis so
two chips split the activation traffic — not more single-op swaps.

Model: every conv backward must read its stored input activation, read
the output cotangent, and write the input cotangent (3 passes over
activation-sized tensors in bf16); dw partial-reduction traffic is
negligible next to activations at these shapes. BN/ReLU backwards are
elementwise over the same tensors and fuse into the surrounding passes
(measured: hand-fusing them is neutral, ops/fused_bn.py), so they add no
extra floor. This is the *optimistic* floor — XLA cannot do better
without changing the math (e.g. remat trades reads for recompute).

Stage map: models/s3d.py stage table at 2x16x112x112 bench geometry
(reference: lib/modeling/backbone/backbone_3d/s3d_1.py:5-329).

Run: PYTHONPATH= JAX_PLATFORMS=cpu python perf/bwd_floor.py
"""

from __future__ import annotations

V5E_HBM_GBS = 819e9      # v5e HBM bandwidth
V5E_BF16_FLOPS = 197e12  # v5e bf16 peak
BF16 = 2

# measured inputs (perf/step_ablate.py, NOTES_NEXT_ROUND.md):
MEASURED_QUERY_FWD_BWD_MS = 75.0
MEASURED_FWD_MS = 18.0
BWD_GFLOP_BS128 = 2049.0  # XLA cost analysis: fwd+bwd 3115 - fwd 1066


def s3d_activations(t=16, h=112, w=112):
    """(elements, tag) per stored activation a conv backward touches."""
    acts = []

    def add(t_, h_, w_, c, tag):
        acts.append((t_ * h_ * w_ * c, tag))

    # stem: spatial (1,7,7)/(1,2,2) then temporal (7,1,1)/(2,1,1)
    add(t, h // 2, w // 2, 64, "stem0_spatial_out")
    t, h, w = t // 2, h // 2, w // 2
    add(t, h, w, 64, "stem0_temporal_out")
    h, w = h // 2, w // 2                       # pool_1 (1,2,2)
    add(t, h, w, 64, "pool1_out")
    add(t, h, w, 64, "stem2_out")
    add(t, h, w, 192, "stem3_spatial_out")
    add(t, h, w, 192, "stem3_temporal_out")
    h, w = h // 2, w // 2                       # pool_4 (1,2,2)
    add(t, h, w, 192, "pool4_out")

    from video_graph_ssl_tpu.models.s3d import _MIXED_SPECS

    def mixed(name, cin):
        b0, b1, b2, b3 = _MIXED_SPECS[name]
        # branch intermediates: two reduces, two sepconv pairs, pool out
        add(t, h, w, b1[0], name + "_b1r")
        add(t, h, w, b1[1], name + "_b1_sp")
        add(t, h, w, b1[1], name + "_b1_t")
        add(t, h, w, b2[0], name + "_b2r")
        add(t, h, w, b2[1], name + "_b2_sp")
        add(t, h, w, b2[1], name + "_b2_t")
        add(t, h, w, cin, name + "_pool")
        add(t, h, w, b0, name + "_b0")
        add(t, h, w, b3, name + "_b3")
        return b0 + b1[1] + b2[1] + b3

    c = mixed("mixed_3b", 192)
    c = mixed("mixed_3c", c)
    t, h, w = t // 2, h // 2, w // 2            # pool_7 (2,2,2 eff)
    add(t, h, w, c, "pool7_out")
    for n in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e", "mixed_4f"):
        c = mixed(n, c)
    t, h, w = max(t // 2, 1), h // 2, w // 2    # pool_13 (2,2,2)
    add(t, h, w, c, "pool13_out")
    for n in ("mixed_5b", "mixed_5c"):
        c = mixed(n, c)
    return acts


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    acts = s3d_activations()
    elems = sum(n for n, _ in acts)
    per_clip = elems * BF16
    b = 128
    # 3 activation-sized passes per conv backward (read act, read dy,
    # write dx)
    traffic = 3 * per_clip * b
    bw_floor_ms = traffic / V5E_HBM_GBS * 1e3
    flop_floor_ms = BWD_GFLOP_BS128 * 1e9 / V5E_BF16_FLOPS * 1e3
    measured = MEASURED_QUERY_FWD_BWD_MS - MEASURED_FWD_MS
    print(f"stored activations/clip: {per_clip / 1e6:.1f} MB bf16 "
          f"({len(acts)} tensors)")
    print(f"backward HBM traffic (bs={b}): {traffic / 1e9:.1f} GB")
    print(f"bandwidth floor: {bw_floor_ms:.1f} ms   "
          f"FLOP floor: {flop_floor_ms:.1f} ms   "
          f"measured bwd: ~{measured:.0f} ms")
    print(f"-> floors are within {bw_floor_ms / flop_floor_ms:.1f}x of "
          f"each other; measured sits {measured / bw_floor_ms:.2f}x above "
          f"the optimistic BW floor — distributed small-pass overhead, "
          f"see module docstring")


if __name__ == "__main__":
    main()
