"""Checkpoint/resume + fault-injection tests (SURVEY.md §5.3, §5.4, §4)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from colvo.config import ColvoConfig
from colvo.runtime import (
    CheckpointManager,
    TrainState,
    export_params,
    load_params,
    fold_batchnorm,
    torch_conv_to_hwio,
    init_state,
    make_optimizer,
    make_train_step,
)


def small_cfg():
    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.model.n_scales = 2
    cfg.data.height = cfg.data.width = 64
    cfg.data.frame_offsets = (1,)
    cfg.data.batch_size = 1
    return cfg


def _fake_state(seed: int = 0) -> TrainState:
    """Checkpoint payload with the TrainState shape but no conv model:
    the serde tests exercise Orbax layout/restore logic, which is
    structure-generic — building the real model costs a ~20 s CPU init
    compile per module (fast-loop budget). Gradients/steps through the
    real model are covered by the slow-marked kill-and-resume test."""
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32)

    params = {"params": {"depth": {"encoder": {"Conv_0": {"kernel": arr(3, 3, 3, 8)}},
                                   "decoder": {"ConvBlock_0": {"Conv_0": {
                                       "kernel": arr(3, 3, 8, 4), "bias": arr(4)}}}},
                         "pose_decoder": {"Conv_0": {"kernel": arr(1, 1, 8, 6)}}}}
    tx = make_optimizer(small_cfg())
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


@pytest.fixture(scope="module")
def model_state():
    cfg = small_cfg()
    return cfg, None, _fake_state()


@pytest.fixture(scope="module")
def real_model_state():
    """The full ColVOModel TrainState — only the slow fault-injection
    test pays for this init compile."""
    cfg = small_cfg()
    model, state = init_state(cfg, jax.random.key(0))
    return cfg, model, state


def test_orbax_roundtrip(tmp_path, model_state):
    cfg, model, state = model_state
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(7, jax.tree.map(np.asarray, state))
    mgr.wait()
    restored, step = mgr.restore(state)
    assert step == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_keep_n_policy(tmp_path, model_state):
    cfg, model, state = model_state
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    state_np = jax.tree.map(np.asarray, state)
    for s in (1, 2, 3):
        mgr.save(s, state_np)
    mgr.wait()
    assert mgr.latest_step() == 3
    _, step = mgr.restore(state)  # latest
    assert step == 3
    with pytest.raises(Exception):
        mgr.restore(state, step=1)  # evicted by keep=2
    mgr.close()


@pytest.mark.slow
def test_kill_and_resume_bitwise(tmp_path, real_model_state):
    """Fault injection (SURVEY.md §5.3): training state saved at step k and
    'killed'; a fresh process-equivalent restore must continue bitwise."""
    cfg, model, state = real_model_state
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.random((1, 2, 64, 64, 3)).astype(np.float32)),
        "frames_clean": None,
        "k": jnp.asarray(
            np.array([[38.4, 0, 32], [0, 38.4, 32], [0, 0, 1]], np.float32)
        ),
    }
    batch["frames_clean"] = batch["frames"]

    # run 3 steps, checkpoint, run 2 more → reference.
    # (copy first: the jitted step donates its input state, and `state`
    # is a shared module-scoped fixture)
    s = jax.tree.map(jnp.array, state)
    for _ in range(3):
        s, _ = step_fn(s, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, jax.tree.map(np.asarray, s))
    mgr.wait()
    ref = s
    for _ in range(2):
        ref, _ = step_fn(ref, batch)

    # "crash" → restore → 2 steps → must equal reference bitwise
    _, fresh = init_state(cfg, jax.random.key(0))
    restored, step = mgr.restore(fresh)
    assert step == 3
    for _ in range(2):
        restored, _ = step_fn(restored, batch)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_grain_resume_bitwise(tmp_path, model_state):
    """Kill-and-resume of the INPUT PIPELINE (SURVEY.md §5.3, VERDICT r2
    next #7): the checkpoint carries the grain iterator state at the saved
    step — even though the loop prefetches ahead — and the resumed stream
    is the bitwise continuation (no skip-ahead approximation)."""
    pytest.importorskip("grain.python")
    from colvo.data import SnippetDataset, render_sequence
    from colvo.data.grain_loader import grain_batch_iterator

    cfg, model, state = model_state
    seq = render_sequence(n_frames=16, height=64, width=64, seed=3)
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)

    it = grain_batch_iterator(ds, cfg.data, seed=0, num_epochs=4)
    consumed = [next(it) for _ in range(6)]  # steps 1..4 + 2 prefetched
    # Checkpoint "at step 4" while the prefetcher has pulled 2 ahead:
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(4, jax.tree.map(np.asarray, state), loader_state=it.state_at(4))
    mgr.wait()
    # the true continuation after step 4 = batches 5, 6, 7
    future = consumed[4:] + [next(it)]

    # "crash" → fresh process: new iterator + restore
    fresh = _fake_state()
    it2 = grain_batch_iterator(ds, cfg.data, seed=0, num_epochs=4)
    _, step, loader_state = mgr.restore(fresh, with_loader_state=True)
    assert step == 4 and loader_state is not None
    it2.set_state(loader_state)
    for want in future:
        got = next(it2)
        np.testing.assert_array_equal(
            np.asarray(want["frames"]), np.asarray(got["frames"])
        )
    # old-style checkpoints (no loader item) still restore
    mgr2 = CheckpointManager(str(tmp_path / "ckpt2"))
    mgr2.save(1, jax.tree.map(np.asarray, state))
    mgr2.wait()
    _, step, ls = mgr2.restore(fresh, with_loader_state=True)
    assert step == 1 and ls is None
    mgr.close()
    mgr2.close()


def test_restore_legacy_single_item_layout(tmp_path, model_state):
    """Checkpoints written before the loader-state upgrade were saved as a
    single unnamed item (plain StandardSave → on-disk 'default'); restore
    must detect that layout and fall back instead of raising (ADVICE r3)."""
    import orbax.checkpoint as ocp

    cfg, model, state = model_state
    legacy_dir = str(tmp_path / "ckpt")
    raw = ocp.CheckpointManager(os.path.abspath(legacy_dir))
    raw.save(5, args=ocp.args.StandardSave(
        jax.tree.map(np.asarray, state)._asdict()))
    raw.wait_until_finished()
    raw.close()

    mgr = CheckpointManager(legacy_dir)
    restored, step = mgr.restore(state)
    assert step == 5
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the loader-state variant reports None rather than raising
    _, step, ls = mgr.restore(state, with_loader_state=True)
    assert step == 5 and ls is None
    mgr.close()


def test_export_load_params_roundtrip(tmp_path, model_state):
    _, _, state = model_state
    path = str(tmp_path / "weights.npz")
    export_params(state.params, path)
    loaded = load_params(path)
    flat_a = jax.tree.leaves(state.params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fold_batchnorm_matches_torch():
    """BN folding for torch-weight import (SURVEY.md §5.4): conv+BN in torch
    ≡ folded conv here."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.random((1, 4, 8, 8)).astype(np.float32)  # NCHW
    w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)  # OIHW
    gamma = rng.random(6).astype(np.float32) + 0.5
    beta = rng.normal(size=6).astype(np.float32)
    mean = rng.normal(size=6).astype(np.float32)
    var = rng.random(6).astype(np.float32) + 0.1

    tx = torch.from_numpy(x)
    ty = F.conv2d(tx, torch.from_numpy(w), padding=1)
    ty = F.batch_norm(
        ty, torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(gamma), torch.from_numpy(beta), training=False,
    )
    ref = ty.numpy()

    w_hwio = torch_conv_to_hwio(w)
    w_f, b_f = fold_batchnorm(w_hwio, gamma, beta, mean, var)
    import jax.numpy as jnp

    out = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(w_f),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b_f
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4
    )
