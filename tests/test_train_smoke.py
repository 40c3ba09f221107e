"""Integration: overfit smoke + DP-equivalence tests (SURVEY.md §4.4, §4.5).

Synthetic textured colon snippets with known geometry: total loss must
drop substantially in a few dozen steps, and the sharded step must be
numerically ≡ the single-device step with collectives in the lowered HLO.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from colvo.config import ColvoConfig
from colvo.data import SnippetDataset, batch_iterator, render_sequence
from colvo.runtime import (
    init_state,
    make_optimizer,
    make_train_step,
    make_mesh,
    shard_batch,
    replicate_tree,
    TrainState,
)


def tiny_config(batch_size=2, h=64, w=64):
    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.data.height = h
    cfg.data.width = w
    cfg.data.batch_size = batch_size
    cfg.data.augment = False
    cfg.train.lr = 3e-4
    return cfg


def make_batch(cfg, n_frames=8, seed=11):
    seq = render_sequence(
        n_frames=n_frames, height=cfg.data.height, width=cfg.data.width, seed=seed
    )
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    it = batch_iterator(ds, cfg.data, seed=0)
    return next(it)


@pytest.mark.slow
def test_overfit_smoke():
    # 2 scales + 1 source keeps the CPU compile/runtime tractable while
    # still exercising the full fwd+bwd+update path end to end.
    cfg = tiny_config(batch_size=2, h=64, w=64)
    cfg.model.n_scales = 2
    cfg.data.frame_offsets = (1,)
    cfg.train.lr = 1e-3
    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg))

    losses = []
    for _ in range(15):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss/total"]))
    assert np.all(np.isfinite(losses))
    # overfit on one batch: loss must drop meaningfully
    assert losses[-1] < 0.85 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_dp_step_equals_single_device():
    """SPMD DP over the faked multi-device CPU mesh ≡ single-device step (SURVEY.md §4.5)."""
    cfg = tiny_config(batch_size=8, h=32, w=32)
    cfg.model.n_scales = 2
    cfg.data.frame_offsets = (1,)
    model, state0 = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, n_frames=12))

    # single device
    state_a, metrics_a = step_fn(state0, batch)

    # DP over all faked devices
    assert len(jax.devices()) >= 2, "conftest must fake >=2 CPU devices"
    mesh = make_mesh()
    model, state0b = init_state(cfg, jax.random.key(0))
    state0b = TrainState(
        replicate_tree(state0b.params, mesh),
        replicate_tree(state0b.opt_state, mesh),
        state0b.step,
    )
    sharded_batch = shard_batch(batch, mesh)
    state_b, metrics_b = step_fn(state0b, sharded_batch)

    # Shard-local fp differences (per-device conv tilings) can flip a
    # knife-edge validity-mask pixel; with masked-mean losses on the small
    # native-scale geo grids one flipped pixel moves the loss by ~1e-3
    # relative. A real sharding bug shows up orders of magnitude larger.
    np.testing.assert_allclose(
        float(metrics_a["loss/total"]), float(metrics_b["loss/total"]), rtol=5e-3
    )
    # Per-device partial sums reduce in a different order than the
    # single-device reduction. The first Adam update is ±lr·sign(g), so an
    # fp-noise sign flip on a near-zero gradient moves a param by exactly
    # 2·lr — bound the comparison there (0.009% of elements in practice;
    # any real sharding bug shows up orders of magnitude larger).
    la = jax.tree.leaves(state_a.params)
    lb = jax.tree.leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * cfg.train.lr)


def test_dp_hlo_contains_collective():
    """The lowered DP program must contain an all-reduce over the mesh."""
    cfg = tiny_config(batch_size=8, h=32, w=32)
    cfg.model.n_scales = 2
    cfg.data.frame_offsets = (1,)
    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, n_frames=12))
    mesh = make_mesh()
    state = TrainState(
        replicate_tree(state.params, mesh),
        replicate_tree(state.opt_state, mesh),
        state.step,
    )
    sharded_batch = shard_batch(batch, mesh)
    lowered = step_fn.lower(state, sharded_batch)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "expected gradient all-reduce in DP HLO"


@pytest.mark.slow
def test_basin_detect_and_restart(tmp_path):
    """Basin detect-and-restart (runtime/loop.py; VERDICT r4 next #4): with
    train.restart_* armed and the metric over threshold at the check step,
    the loop discards the attempt, reinits with a derived seed, wipes the
    failed attempt's checkpoints (same step numbers re-save without Orbax
    conflicts), and the final allowed attempt runs to completion."""
    import json
    import os

    from colvo.runtime import train as train_loop

    cfg = tiny_config(batch_size=2, h=64, w=64)
    cfg.model.n_scales = 2
    cfg.data.frame_offsets = (1,)
    cfg.train.log_every = 2
    cfg.train.ckpt_every_steps = 2  # attempt 0 saves step 2 BEFORE the
    #   restart — exercises ckpt.reset (re-saving step 2 would conflict)
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.train.restart_metric = "loss/total"
    cfg.train.restart_threshold = 1e-9  # always trips at the check step
    cfg.train.restart_check_step = 3
    cfg.train.restart_max = 1  # attempt 1 must run to completion anyway
    seq = render_sequence(n_frames=8, height=64, width=64, seed=3)
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    _, state = train_loop(cfg, ds, log_dir=str(tmp_path / "log"), max_steps=6)

    rows = [json.loads(l)
            for l in open(tmp_path / "log" / "metrics.jsonl")]
    restarts = [r for r in rows if "restart/attempt" in r]
    assert len(restarts) == 1, restarts  # restart_max=1: exactly one
    assert restarts[0]["restart/new_seed"] == cfg.train.seed + 1000
    assert restarts[0]["restart/metric_value"] > 0
    # attempt 1 reached max_steps and re-saved the wiped step numbers
    assert int(state.step) == 6
    saved = sorted(int(d) for d in os.listdir(cfg.train.ckpt_dir)
                   if d.isdigit())
    assert 6 in saved, saved


@pytest.mark.slow
def test_dispatch_side_nan_stop(tmp_path):
    """Diverged-model hard stop (runtime/loop.py): the loop retires the
    loss from N log windows back on the dispatch side, so training aborts
    on non-finite loss even when the async logger's fetches lag — the
    failure mode that wedged the exposure-jitter ablation cell (async
    dispatch queued 4000 steps onto a crawling device and every
    value-based guard starved)."""
    from colvo.runtime import train as train_loop

    cfg = tiny_config(batch_size=2, h=64, w=64)
    cfg.model.n_scales = 2
    cfg.data.frame_offsets = (1,)
    cfg.train.log_every = 1
    cfg.train.dispatch_ahead_windows = 1
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    seq = render_sequence(n_frames=8, height=64, width=64, seed=3)
    frames = seq.frames.copy()
    frames[2] = np.nan  # poisoned frame → non-finite loss
    ds = SnippetDataset([frames], [seq.k], cfg.data.frame_offsets)
    with pytest.raises(RuntimeError, match="non-finite"):
        train_loop(cfg, ds, log_dir=str(tmp_path / "log"), max_steps=30)
