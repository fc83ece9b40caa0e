"""Disk-to-features end-to-end parity vs the EXECUTED reference.

Synthetic JPEG frame folders -> the reference's ``BaseDataset`` + cv2 val
transform chain (executed torch code) vs our ``FrameDataset``/``Loader`` +
device eval chain on the SAME files: model inputs must agree to float
rounding, and S3D encoder features (weights bit-converted from one torch
init) to eval tolerance.  This jointly validates frame decode, val-index
sampling, host resize, center-crop and normalize — the exact surface that
retrieval / linear-probe accuracy parity rides on.

Reference surfaces executed AS SHIPPED:
  * ``lib/data/datasets/dataset.py:52-66``  — ``_load_image`` (cv2 BGR->RGB)
  * ``lib/data/datasets/dataset.py:87-93``  — ``_get_val_indices``
  * ``lib/data/datasets/dataset.py:178-191``— ``get_item`` frame stepping
  * ``lib/data/transform/build.py:37-43``   — the cv2 val chain
  * ``consistency_transforms.py`` VideoResize / VideoCenterCrop /
    VideoNormalize / VideoToTensor

The reference's third-party deps absent from this environment are stubbed
at their documented semantics before import: ``albumentations``'s
functional ``resize`` (cv2.resize, (w, h) order) and ``center_crop``
(floor-centered window), and ``torchvision.transforms.Compose``.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REF_ROOT = "/root/reference"

T, SCALE, CROP = 8, 128, 112
VIDEOS = [("cls_a/vid_000", 29, 0), ("cls_b/vid_001", 36, 1),
          ("cls_a/vid_002", 45, 0)]


def _install_ref_dep_stubs(cv2):
    """albumentations.functional + torchvision.Compose at documented
    semantics (idempotent; extends stubs other tests may have planted)."""

    def resize(img, height, width, interpolation=cv2.INTER_LINEAR):
        return cv2.resize(img, (width, height), interpolation=interpolation)

    def center_crop(img, crop_height, crop_width):
        h, w = img.shape[:2]
        y1 = (h - crop_height) // 2
        x1 = (w - crop_width) // 2
        return img[y1:y1 + crop_height, x1:x1 + crop_width]

    func = sys.modules.get("albumentations.augmentations.functional")
    if func is None:
        alb = types.ModuleType("albumentations")
        aug = types.ModuleType("albumentations.augmentations")
        func = types.ModuleType("albumentations.augmentations.functional")
        alb.augmentations = aug
        aug.functional = func
        sys.modules["albumentations"] = alb
        sys.modules["albumentations.augmentations"] = aug
        sys.modules["albumentations.augmentations.functional"] = func
    func.resize = resize
    func.center_crop = center_crop

    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    if not hasattr(tv, "transforms") or not hasattr(tv.transforms, "Compose"):
        class Compose:
            def __init__(self, transforms):
                self.transforms = transforms

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        transforms = getattr(tv, "transforms", None)
        if transforms is None or isinstance(transforms, types.SimpleNamespace):
            tv.transforms = types.SimpleNamespace(
                **(vars(transforms) if transforms else {}))
        tv.transforms.Compose = Compose


@pytest.fixture(scope="module")
def frame_root(tmp_path_factory):
    """JPEG frame folders + a `<path> <n_frames> <label>` split file."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("frames")
    g = np.random.default_rng(0)
    lines = []
    for rel, n, label in VIDEOS:
        d = root / rel
        d.mkdir(parents=True)
        # smooth, per-frame-varying content (realistic JPEG behavior; both
        # sides decode the same bytes so content does not affect parity)
        base = g.uniform(40, 215, (240, 320, 3))
        for i in range(1, n + 1):
            img = base + 30 * np.sin(i / 3.0) + g.normal(0, 6, base.shape)
            img = np.clip(img, 0, 255).astype(np.uint8)
            ok = cv2.imwrite(str(d / f"img_{i:05d}.jpg"),
                             cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            assert ok
        lines.append(f"{rel} {n} {label}")
    split = root / "val_split.txt"
    split.write_text("\n".join(lines) + "\n")
    return root, split


def _make_cfg(root, split):
    from video_graph_ssl_tpu.config import cfg as CFG

    c = CFG.clone()
    c.MODEL.BACKBONE = "S3D"
    c.MODEL.BACKBONE_TYPE = "3D"
    c.DATASET.SOURCE = "frames"
    c.DATASET.VISUAL_ROOT_DIR = str(root)
    c.DATASET.VALIDATION_SPLIT = str(split)
    c.DATASET.NUM_CLASS = 2
    c.INPUT.MODALITY = "RGB"
    c.INPUT.SAMPLE_TYPE = "uniform"
    c.INPUT.PRE_LOAD = "cv2"
    c.INPUT.VIDEO_LENGTH = T
    c.INPUT.SCALE_SIZE = [SCALE, SCALE]
    c.INPUT.CROP_SIZE = [CROP, CROP]
    c.INPUT.BASE_SIZE = [CROP, CROP]
    c.TEST.BATCH_SIZE = len(VIDEOS)
    c.DATALOADER.NUM_WORKERS = 1
    c.TPU.COMPUTE_DTYPE = "float32"
    return c


@pytest.fixture(scope="module")
def both_inputs(frame_root):
    """(ref_inputs (B,C,T,H,W) np, our_inputs (B,T,H,W,C) np, labels)."""
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("torch")
    root, split = frame_root

    # --- reference pipeline, executed as shipped
    _install_ref_dep_stubs(cv2)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    ref_ds_mod = importlib.import_module("lib.data.datasets.dataset")
    ref_tf_mod = importlib.import_module("lib.data.transform.build")

    cfg = _make_cfg(root, split)
    val_t = ref_tf_mod.build_transform_cv2(cfg, is_train=False)
    ref_ds = ref_ds_mod.BaseDataset(
        root_path=str(root), list_file=str(split), video_length=T,
        sample_type="uniform", modality="RGB", pre_load="cv2",
        image_tmpl="img_{:05d}.jpg", transform=val_t, random_shift=False)
    ref_items = [ref_ds[i] for i in range(len(ref_ds))]
    ref_inputs = np.stack([it[0].numpy() for it in ref_items])  # (B,C,T,H,W)
    ref_labels = np.asarray([it[1] for it in ref_items])

    # --- our pipeline: host loader -> device eval chain
    from video_graph_ssl_tpu.data.build import make_data_loader
    from video_graph_ssl_tpu.data.transforms_device import make_batch_augment

    loader = make_data_loader(cfg, is_train=False)
    batch = next(iter(loader.epoch(0)))
    assert batch["clips"].shape == (len(VIDEOS), T, SCALE, SCALE, 3)
    augment = make_batch_augment(cfg, "eval")
    our_inputs = np.asarray(augment(batch["clips"]))  # (B,T,h,w,C) float32
    return ref_inputs, our_inputs, ref_labels, np.asarray(batch["label"])


def test_disk_to_model_inputs_parity(both_inputs):
    """Same JPEGs -> same normalized model inputs, to float rounding.

    Decode and the SCALE resize are the identical cv2 calls on both sides;
    center-crop windows coincide ((SCALE-CROP) even); normalize is
    (x-255m)/(255s) vs (x/255-m)/s — equal up to fp32 rounding."""
    ref_inputs, our_inputs, ref_labels, our_labels = both_inputs
    ours_as_ref = our_inputs.transpose(0, 4, 1, 2, 3)  # -> (B,C,T,H,W)
    assert ours_as_ref.shape == ref_inputs.shape
    diff = np.abs(ours_as_ref - ref_inputs).max()
    assert diff < 1e-4, f"model-input divergence {diff}"
    np.testing.assert_array_equal(ref_labels, our_labels)


@pytest.mark.slow
def test_disk_to_features_parity(both_inputs):
    """Each side's own pipeline inputs -> S3D encoder features from ONE
    torch init, compared at eval tolerance (the retrieval surface).

    Deliberate exception to the micro-shape test convention (ADVICE r4
    item 4): the claim under test is the END-TO-END disk->features surface,
    so it needs the real S3D at a real eval geometry (8x112x112, batch 3 —
    the smallest size at which every stage of the production backbone and
    cv2-matching resize path is exercised); tiny3d would not cover the
    converter or the multi-stage resize. Costs ~1-2 min of the slow CPU
    suite; keep it, don't copy the pattern."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fidelity_check import _head_pool, _load_ref_module

    from video_graph_ssl_tpu.models.s3d import S3D
    from video_graph_ssl_tpu.utils.torch_interop import convert_torch_s3d

    ref_inputs, our_inputs, _, _ = both_inputs

    mod = _load_ref_module("s3d_1.py", "ref_s3d_diskparity")
    ref = mod.S3D(num_class=4)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    with torch.no_grad():
        theirs = _head_pool(ref.base(torch.from_numpy(ref_inputs)).numpy())

    import jax.numpy as jnp

    params, stats = convert_torch_s3d(sd, with_classifier=False)
    model = S3D(num_classes=None, dtype=jnp.float32)
    encode = jax.jit(lambda x: model.apply(
        {"params": params, "batch_stats": stats}, x, train=False))
    # fp32 torch is the ground truth here: pin fp32 conv/matmul precision
    # (TPU's default lowers fp32 contractions to bf16 passes, ~5e-3 rel —
    # same pinning as tests/test_cmc_memory_golden.py).
    with jax.default_matmul_precision("float32"):
        ours = np.asarray(encode(jnp.asarray(our_inputs)))

    rel = (np.linalg.norm(ours - theirs)
           / max(np.linalg.norm(theirs), 1e-12))
    assert rel < 1e-4, f"feature rel_l2 {rel}"
