#!/usr/bin/env python
"""Reference-checkpoint fidelity check (BASELINE.md north star).

One command that proves a reference PyTorch S3D checkpoint produces the
same features in this framework:

  1. load the torch state_dict (``--torch_ckpt``; or synthesize a random
     reference-shaped one with ``--synthetic`` for the data-less dry run),
  2. run the REFERENCE model code itself (imported by file path from
     /root/reference, executed as ground truth — nothing is copied) on a
     fixed input batch,
  3. convert the checkpoint with utils/torch_interop.convert_torch_s3d and
     run our S3D under jit,
  4. report feature/logit MSE, max abs diff, and cosine similarity, and
     exit non-zero if outside tolerance.

With real UCF101/HMDB51 data, follow up with tools/video_retrieval.py on
both frameworks' features and compare R@k against BASELINE.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_S3D = "/root/reference/lib/modeling/backbone/backbone_3d/s3d_1.py"


def load_reference_s3d(num_classes: int):
    """Execute the reference's own S3D definition as ground truth."""
    spec = importlib.util.spec_from_file_location("ref_s3d", REF_S3D)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.S3D(num_class=num_classes)


def synthesize_state_dict(num_classes):
    from video_graph_ssl_tpu.utils.torch_interop import (
        reference_s3d_shape_manifest)
    g = np.random.default_rng(0)
    sd = {}
    for name, shape in reference_s3d_shape_manifest(num_classes).items():
        if name.endswith("running_var"):
            sd[name] = g.uniform(0.5, 1.5, shape).astype(np.float32)
        elif name.endswith(("weight",)) and len(shape) == 5:
            sd[name] = (g.standard_normal(shape) * 0.05).astype(np.float32)
        else:
            sd[name] = (g.standard_normal(shape) * 0.1).astype(np.float32)
    return sd


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch_ckpt", default=None,
                    help=".pth/.pth.tar reference checkpoint")
    ap.add_argument("--synthetic", action="store_true",
                    help="dry run on a synthesized reference-shaped ckpt")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--num_classes", type=int, default=101)
    ap.add_argument("--tol_rel", type=float, default=2e-3,
                    help="max allowed relative L2 error (fp32 conv reorder)")
    args = ap.parse_args(argv)

    import torch

    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_s3d, load_torch_file, strip_prefixes)

    if args.torch_ckpt:
        sd = strip_prefixes(load_torch_file(args.torch_ckpt))
    elif args.synthetic:
        sd = synthesize_state_dict(args.num_classes)
    else:
        ap.error("pass --torch_ckpt PATH or --synthetic")

    has_fc = "fc.0.weight" in sd
    n_cls = sd["fc.0.weight"].shape[0] if has_fc else args.num_classes

    # ---- reference side (torch, NCDHW) ------------------------------------
    ref = load_reference_s3d(n_cls)
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    unexpected = [k for k in unexpected if not k.endswith("num_batches_tracked")]
    assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
    if missing:
        print(f"note: {len(missing)} reference params not in ckpt "
              f"(e.g. {missing[0]}) — encoder-only checkpoint")
    ref.eval()

    g = np.random.default_rng(42)
    x = g.standard_normal(
        (args.batch, args.frames, args.size, args.size, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
        base = ref.base(xt)                                      # (B,C,T',H',W')
        # reference head weighting (s3d_1.py:28-35): spatial mean ->
        # adjacent-pair average -> temporal mean
        feat_t = base.mean(dim=(3, 4))                           # (B, C, T')
        if feat_t.shape[-1] > 1:
            feat_t = (feat_t[..., :-1] + feat_t[..., 1:]) * 0.5
        ref_feat = feat_t.mean(dim=-1).numpy()
        ref_logits = ref(xt).numpy() if has_fc else None

    # ---- our side (jax, NDHWC, fp32 eval) ---------------------------------
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.models.s3d import S3D

    params, stats = convert_torch_s3d(sd, with_classifier=has_fc)
    model = S3D(num_classes=n_cls if has_fc else None, dtype=jnp.float32)
    variables = {"params": params, "batch_stats": stats}
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        variables, jnp.asarray(x))
    out = np.asarray(out)

    if has_fc:
        ours, theirs, what = out, ref_logits, "logits"
    else:
        ours, theirs, what = out, ref_feat, "features"

    diff = ours - theirs
    rel = np.linalg.norm(diff) / max(np.linalg.norm(theirs), 1e-12)
    cos = float(np.sum(ours * theirs)
                / max(np.linalg.norm(ours) * np.linalg.norm(theirs), 1e-12))
    print(f"{what}: shape {ours.shape}  mse {np.mean(diff**2):.3e}  "
          f"max|d| {np.max(np.abs(diff)):.3e}  rel_l2 {rel:.3e}  cos {cos:.6f}")
    ok = rel < args.tol_rel
    print("FIDELITY_OK" if ok else f"FIDELITY_FAIL (rel_l2 {rel:.3e} "
          f">= {args.tol_rel})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
