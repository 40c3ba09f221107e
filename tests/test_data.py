"""Data layer tests (SURVEY.md §2.1, D1–D5)."""

import numpy as np
import pytest

from colvo.config import DataConfig
from colvo.data import (
    ArraySource,
    SnippetDataset,
    batch_iterator,
    color_jitter,
    augment_snippet,
    prefetch_to_device,
    render_sequence,
    Intrinsics,
)


@pytest.fixture(scope="module")
def seq():
    return render_sequence(n_frames=16, height=64, width=64)


def _cfg(**kw):
    return DataConfig(height=64, width=64, batch_size=4, **kw)


def test_snippet_dataset_indexing(seq):
    ds = SnippetDataset([seq.frames], [seq.k], (-1, 1))
    assert len(ds) == 14  # targets 1..14
    s = ds[0]
    assert s.frames.shape == (3, 64, 64, 3)
    np.testing.assert_array_equal(s.frames[0], seq.frames[1])  # target
    np.testing.assert_array_equal(s.frames[1], seq.frames[0])  # offset −1
    np.testing.assert_array_equal(s.frames[2], seq.frames[2])  # offset +1


def test_batch_iterator_contract(seq):
    cfg = _cfg()
    ds = SnippetDataset([seq.frames], [seq.k], cfg.frame_offsets)
    it = batch_iterator(ds, cfg, seed=0, epochs=1)
    batches = list(it)
    assert len(batches) == len(ds) // cfg.batch_size
    b = batches[0]
    assert b["frames"].shape == (4, 3, 64, 64, 3)
    assert b["frames"].dtype == np.float32
    assert b["k"].shape == (3, 3)
    # augmented input differs from clean loss copy, both in [0, 1]
    assert not np.allclose(b["frames"], b["frames_clean"])
    assert b["frames"].min() >= 0 and b["frames"].max() <= 1


def test_augment_identical_across_snippet_frames(seq):
    """The same jitter must hit every frame of a snippet (the warp must stay
    valid) — verified by checking the per-frame mean shifts identically."""
    cfg = _cfg(hflip=False)
    frames = seq.frames[:3][None]  # (1, 3, H, W, 3)
    rng = np.random.default_rng(0)
    aug, clean = augment_snippet(frames, cfg, rng)
    shift = aug[0] - clean[0]
    # brightness/contrast/saturation are global per snippet: the mean shift
    # of each frame should be nearly equal
    means = shift.reshape(3, -1).mean(axis=1)
    assert np.ptp(means) < 0.02, means


def test_hflip_applies_to_clean_too(seq):
    cfg = _cfg(brightness=0, contrast=0, saturation=0, hue=0)
    frames = np.repeat(seq.frames[:3][None], 8, axis=0)
    rng = np.random.default_rng(3)
    aug, clean = augment_snippet(frames, cfg, rng)
    # geometric change must be shared (aug == clean when jitter off)
    np.testing.assert_array_equal(aug, clean)
    flipped = [not np.array_equal(c, frames[i]) for i, c in enumerate(clean)]
    assert any(flipped) and not all(flipped)  # ~half the batch flips


def test_intrinsics_scaling():
    k = Intrinsics(fx=100, fy=110, cx=32, cy=24, width=64, height=48)
    s = k.scaled(128, 96)
    assert s.fx == 200 and s.fy == 220 and s.cx == 64 and s.cy == 48
    np.testing.assert_allclose(s.inverse @ s.matrix, np.eye(3), atol=1e-6)


def test_prefetch_preserves_order(seq):
    cfg = _cfg()
    ds = SnippetDataset([seq.frames], [seq.k], cfg.frame_offsets)
    direct = list(batch_iterator(ds, cfg, seed=0, epochs=1))
    fetched = list(prefetch_to_device(batch_iterator(ds, cfg, seed=0, epochs=1)))
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a["frames"], np.asarray(b["frames"]))


def test_grain_loader_contract_and_resume(seq):
    gp = pytest.importorskip("grain.python")
    from colvo.data.grain_loader import grain_loader

    cfg = _cfg()
    ds = SnippetDataset([seq.frames], [seq.k], cfg.frame_offsets)
    loader = grain_loader(ds, cfg, seed=0, num_epochs=2)
    it = iter(loader)
    b1 = next(it)
    assert b1["frames"].shape == (4, 3, 64, 64, 3)
    state = it.get_state()
    b2 = next(it)
    it2 = iter(loader)
    it2.set_state(state)
    b2r = next(it2)
    np.testing.assert_array_equal(b2["frames"], b2r["frames"])


def test_array_source_roundtrip(seq):
    src = ArraySource(seq.frames)
    assert len(src) == 16
    np.testing.assert_array_equal(src[3], seq.frames[3])


def test_batch_iterator_rejects_undersized_dataset(seq):
    # n < batch_size used to make the epoch loop yield NOTHING and next()
    # block forever (silent 15-min hang in bench_train at B=24). Must
    # fail loudly instead.
    cfg = _cfg()
    cfg.batch_size = 100
    ds = SnippetDataset([seq.frames], [seq.k], cfg.frame_offsets)
    with pytest.raises(ValueError, match="batch_size"):
        next(batch_iterator(ds, cfg, seed=0))
    # epochs=0 is a legitimate empty-iterator sentinel: no epoch will run,
    # so the undersized-dataset guard must not fire (ADVICE r4).
    assert list(batch_iterator(ds, cfg, seed=0, epochs=0)) == []


def test_exposure_jitter_scales_frames_only():
    # auto-exposure nuisance (LCC-in-regime ablation): per-frame gain on
    # RGB, deterministic in seed; geometry (depth/poses) untouched.
    a = render_sequence(n_frames=5, height=48, width=64, seed=5)
    b = render_sequence(n_frames=5, height=48, width=64, seed=5,
                        exposure_jitter=0.35)
    gains = b.frames.mean(axis=(1, 2, 3)) / a.frames.mean(axis=(1, 2, 3))
    assert gains.std() > 0.05  # frames genuinely differ in exposure
    np.testing.assert_array_equal(a.depths, b.depths)
    np.testing.assert_array_equal(a.poses, b.poses)
    assert b.frames.min() >= 0.0 and b.frames.max() <= 1.0
    c = render_sequence(n_frames=5, height=48, width=64, seed=5,
                        exposure_jitter=0.35)
    np.testing.assert_array_equal(b.frames, c.frames)
