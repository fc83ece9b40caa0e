"""Host loader: determinism, shapes, epoch shuffling, clean shutdown."""

import numpy as np

from video_graph_ssl_tpu.data import (
    Loader,
    SyntheticContrastiveDataset,
    SyntheticFrameDataset,
    build_video_contrastive_loader,
    make_data_loader,
)


def _loader(**kw):
    ds = SyntheticContrastiveDataset(n_data=32, video_length=4,
                                     canvas_hw=(8, 8), num_classes=4)
    defaults = dict(batch_size=8, shuffle=True, num_workers=2, seed=0)
    defaults.update(kw)
    return Loader(ds, **defaults)


def test_batch_shapes_and_len():
    loader = _loader()
    assert len(loader) == 4
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    b = batches[0]
    assert b["clips"].shape == (8, 2, 4, 8, 8, 3)
    assert b["clips"].dtype == np.uint8
    assert b["label"].shape == (8,)
    assert b["index"].shape == (8,)


def test_deterministic_same_epoch():
    b1 = next(iter(_loader().epoch(3)))
    b2 = next(iter(_loader().epoch(3)))
    np.testing.assert_array_equal(b1["clips"], b2["clips"])
    np.testing.assert_array_equal(b1["index"], b2["index"])


def test_epoch_shuffling_differs():
    b1 = next(iter(_loader().epoch(0)))
    b2 = next(iter(_loader().epoch(1)))
    assert not np.array_equal(b1["index"], b2["index"])


def test_no_shuffle_is_sequential():
    loader = _loader(shuffle=False)
    batches = list(loader.epoch(0))
    idx = np.concatenate([b["index"] for b in batches])
    np.testing.assert_array_equal(idx, np.arange(32))


def test_drop_last_false_keeps_tail():
    ds = SyntheticFrameDataset(n_data=10, video_length=2, canvas_hw=(8, 8))
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                    num_workers=1, seed=0)
    batches = list(loader.epoch(0))
    assert [len(b["label"]) for b in batches] == [4, 4, 2]


def test_early_break_shuts_down():
    loader = _loader(prefetch=1)
    it = loader.epoch(0)
    next(it)
    it.close()  # must not hang


def test_build_contrastive_loader(tiny_cfg):
    loader, n_data = build_video_contrastive_loader(tiny_cfg)
    assert n_data == len(loader.dataset)
    b = next(iter(loader.epoch(0)))
    assert b["clips"].shape[1] == 2  # two views


def test_make_data_loader_downstream(tiny_cfg):
    loader = make_data_loader(tiny_cfg, is_train=True)
    b = next(iter(loader.epoch(0)))
    assert b["clips"].ndim == 5  # (B, T, H, W, C)
