"""Device-resident snippet store tests (SURVEY.md D5, TPU-native form)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from colvo.config import DataConfig
from colvo.data import SnippetDataset, render_sequence
from colvo.data.device_store import DeviceSnippetStore, device_augment


@pytest.fixture(scope="module")
def seq():
    # seed pinned to a trajectory whose 64×64 render has enough texture
    # contrast for the short-horizon learning check below (the default
    # seed's sequence plateaus near init at this tiny scale)
    return render_sequence(n_frames=12, height=64, width=64, seed=4)


def _cfg(**kw):
    return DataConfig(height=64, width=64, batch_size=4, **kw)


def test_store_matches_host_dataset(seq):
    """Device gather must yield the same snippets as the host SnippetDataset
    (up to uint8 quantization)."""
    cfg = _cfg(augment=False)
    host = SnippetDataset([seq.frames], [seq.k], cfg.frame_offsets)
    store = DeviceSnippetStore([seq.frames], [seq.k], cfg.frame_offsets)
    assert store.n_snippets == len(host)
    batch = next(store.batches(cfg, seed=0, epochs=1))
    assert batch["frames"].shape == (4, 3, 64, 64, 3)
    # find which snippet each batch row is by matching the target frame
    for row in range(4):
        got = np.asarray(batch["frames"][row])
        errs = [
            np.abs(got - host[i].frames).max() for i in range(len(host))
        ]
        assert min(errs) <= 1.0 / 255.0 + 1e-6  # uint8 roundtrip


def test_store_epoch_count(seq):
    cfg = _cfg(augment=False)
    store = DeviceSnippetStore([seq.frames], [seq.k], cfg.frame_offsets)
    n = sum(1 for _ in store.batches(cfg, seed=0, epochs=2))
    assert n == 2 * (store.n_snippets // cfg.batch_size)


def test_store_augment_contract(seq):
    cfg = _cfg(augment=True)
    store = DeviceSnippetStore([seq.frames], [seq.k], cfg.frame_offsets)
    b = next(store.batches(cfg, seed=0, epochs=1))
    aug = np.asarray(b["frames"])
    clean = np.asarray(b["frames_clean"])
    assert not np.allclose(aug, clean)
    assert aug.min() >= 0 and aug.max() <= 1
    # jitter identical across the snippet's frames: per-frame mean shifts equal
    shift = (aug - clean)[0].reshape(3, -1).mean(axis=1)
    assert np.ptp(shift) < 0.02


def test_device_augment_flip_shared_and_clean():
    cfg = _cfg(brightness=0, contrast=0, saturation=0, hue=0, hflip=True)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((8, 2, 16, 16, 3)).astype(np.float32))
    aug, clean = device_augment(frames, jax.random.key(1), cfg)
    np.testing.assert_array_equal(np.asarray(aug), np.asarray(clean))
    flipped = [
        not np.array_equal(np.asarray(clean[i]), np.asarray(frames[i]))
        for i in range(8)
    ]
    assert any(flipped) and not all(flipped)


def test_store_rejects_mismatched_k(seq):
    k2 = seq.k.copy()
    k2[0, 0] *= 2
    with pytest.raises(ValueError):
        DeviceSnippetStore([seq.frames, seq.frames], [seq.k, k2])


@pytest.mark.slow
def test_scan_train_chunk_matches_plain_steps(seq):
    """K-step scan chunk ≡ K sequential plain train steps.

    Single-snippet corpus (1-row table) with augmentation off makes the
    scan's on-device sampling deterministic (idx always 0), so the chunk
    must reproduce the plain-step trajectory — a direct machinery test
    (on-device gather, u8 decode, state threading, step counting) with no
    tiny-scale-SGD knife edges. (Learning itself is pinned by
    test_overfit_smoke; the previous mean-loss-drops form here flipped
    with the faked device count's fp reduction order.)
    """
    from colvo.config import ColvoConfig
    from colvo.runtime import (
        init_state,
        make_optimizer,
        make_scan_train,
        make_train_step,
    )

    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.model.n_scales = 2
    cfg.data.height = cfg.data.width = 64
    cfg.data.batch_size = 2
    cfg.data.frame_offsets = (1,)
    cfg.data.augment = False  # test the scan machinery, not aug robustness
    cfg.train.lr = 1e-3

    store = DeviceSnippetStore(
        [np.asarray(seq.frames[:2])], [seq.k], cfg.data.frame_offsets
    )
    assert store.table.shape[0] == 1
    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    # 3 steps: the scan-fused program rounds differently than the separate
    # step program, and on this loss surface the fp drift compounds
    # chaotically through Adam (measured: 1e-7 → 4e-6 → 2e-4 → 2e-2
    # relative per step) — beyond ~3 steps no fixed tolerance is stable.
    n_steps = 3
    chunk_fn = make_scan_train(model, tx, cfg, n_steps=n_steps)
    state_s, metrics = chunk_fn(
        state, store.frames, store.table, store.k, jax.random.key(1)
    )
    losses_scan = np.asarray(metrics["loss/total"])
    assert losses_scan.shape == (n_steps,)
    assert np.all(np.isfinite(losses_scan))
    assert int(state_s.step) == n_steps
    # second chunk threads state and keeps counting
    state_s, metrics2 = chunk_fn(
        state_s, store.frames, store.table, store.k, jax.random.key(2)
    )
    assert int(state_s.step) == 2 * n_steps
    assert np.all(np.isfinite(np.asarray(metrics2["loss/total"])))

    # plain-step reference on the identical (u8-roundtripped) batch
    step_fn = make_train_step(model, tx, cfg)
    snippet = store.frames[store.table[jnp.zeros(2, jnp.int32)]].astype(jnp.float32) / 255.0
    batch = {"frames": snippet, "frames_clean": snippet, "k": store.k}
    _, state_p = init_state(cfg, jax.random.key(0))
    losses_plain = []
    for _ in range(n_steps):
        state_p, m = step_fn(state_p, batch)
        losses_plain.append(float(m["loss/total"]))
    # Per-step tolerance widens with the measured chaotic compounding
    # (docstring above): the programs are equivalent, not identical.
    for i, tol in enumerate((1e-4, 1e-3, 1e-2)):
        np.testing.assert_allclose(
            losses_scan[i], losses_plain[i], rtol=tol, atol=1e-5
        )


@pytest.mark.slow
def test_train_loop_with_device_loader(seq, tmp_path):
    """train() with loader='device' runs end to end (no host batch path)."""
    from colvo.config import ColvoConfig
    from colvo.runtime.loop import train

    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.model.n_scales = 2
    cfg.data.height = cfg.data.width = 64
    cfg.data.batch_size = 8  # divisible over the faked DP mesh
    cfg.data.frame_offsets = (1,)
    cfg.data.loader = "device"
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.train.log_every = 1
    cfg.train.eval_every_epochs = 1
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    from colvo.pipelines import make_training_eval_hook

    _, state = train(cfg, ds, log_dir=str(tmp_path / "runs"), max_steps=3,
                     eval_hook_factory=make_training_eval_hook)
    assert int(state.step) == 3
    # eval hook artifacts: eval/* rows in metrics.jsonl + PNG panels
    import json

    rows = [json.loads(l) for l in (tmp_path / "runs" / "metrics.jsonl").open()]
    assert any(k.startswith("eval/") for r in rows for k in r), rows
    # pose probe (VERDICT r2 next #6): trajectory quality must be visible
    # DURING training, not only at post-hoc eval
    eval_keys = {k for r in rows for k in r if k.startswith("eval/")}
    assert {"eval/ate", "eval/rpe_trans", "eval/rpe_rot_deg"} <= eval_keys, (
        eval_keys
    )
    panels = list((tmp_path / "runs").glob("panels_*.png"))
    assert {p.name.rsplit("_", 1)[0] for p in panels} == {
        "panels_disp", "panels_automask", "panels_warp_error"
    }, panels
