"""Model unit tests (SURVEY.md §4.2): shape/dtype contracts, param counts,
jit-compilability, grad flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from colvo.config import ModelConfig
from colvo.models import ResNetEncoder, DepthDecoder, PoseNet, DepthNet, ColVOModel


H, W = 64, 96  # small but /32-divisible


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(dtype="float32")  # fp32 on CPU for test precision


def _img(b=2, c=3):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((b, H, W, c)).astype(np.float32))


def test_encoder_scales(cfg):
    enc = ResNetEncoder(18, dtype=jnp.float32)
    params = jax.jit(enc.init)(jax.random.key(0), _img())
    feats = jax.jit(enc.apply)(params, _img())
    assert len(feats) == 5
    expect = [(H // 2, W // 2, 64), (H // 4, W // 4, 64), (H // 8, W // 8, 128),
              (H // 16, W // 16, 256), (H // 32, W // 32, 512)]
    for f, (h, w, c) in zip(feats, expect):
        assert f.shape == (2, h, w, c), f.shape


def test_encoder_param_count_resnet18_scale(cfg):
    enc = ResNetEncoder(18, dtype=jnp.float32)
    # param COUNT is a shape property: eval_shape traces without running
    params = jax.eval_shape(enc.init, jax.random.key(0), _img())
    n = sum(p.size for p in jax.tree.leaves(params))
    # torchvision resnet18 convs ≈ 11.2 M; ours (GroupNorm affine ≈ BN affine)
    assert 10e6 < n < 13e6, n


def test_depthnet_multiscale_disp(cfg):
    net = DepthNet(cfg)
    params = jax.jit(net.init)(jax.random.key(0), _img())
    disps, bottleneck = jax.jit(lambda p, x: net.apply(p, x))(params, _img())
    assert set(disps.keys()) == {0, 1, 2, 3}
    for s, d in disps.items():
        assert d.shape == (2, H // 2**s, W // 2**s, 1)
        assert d.dtype == jnp.float32
        v = np.asarray(d)
        assert (v > 0).all() and (v < 1).all()
    assert bottleneck.shape[:3] == (2, H // 32, W // 32)


def test_posenet_shapes_and_scale(cfg):
    net = PoseNet(dcdp_fusion=False, dtype=jnp.float32)
    params = jax.jit(net.init)(jax.random.key(0), _img(), _img())
    aa, tr = jax.jit(lambda p, a, b: net.apply(p, a, b))(params, _img(), _img())
    assert aa.shape == (2, 3) and tr.shape == (2, 3)
    # 0.01 scaling keeps init-time poses near identity
    assert float(jnp.max(jnp.abs(aa))) < 0.1


@pytest.fixture(scope="module")
def colvo_model(cfg):
    """Shared ColVOModel + init (init compile is the heavy part on CPU)."""
    model = ColVOModel(cfg)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.random((2, 3, H, W, 3)).astype(np.float32))
    # jitted init: eager per-op dispatch costs ~7x a cold compile+run of
    # the same graph on CPU (measured in tests/test_losses.py setup)
    params = jax.jit(model.init)(jax.random.key(0), frames)
    return model, params, frames


@pytest.mark.slow
def test_colvo_model_forward_and_grads(cfg, colvo_model):
    model, params, frames = colvo_model
    disps, poses = jax.jit(model.apply)(params, frames)
    assert len(disps) == 3
    assert poses.shape == (2, 2, 6)

    def loss_fn(p):
        ds, ps = model.apply(p, frames)
        return sum(jnp.mean(d[0]) for d in ds) + jnp.mean(ps**2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # gradient must reach the depth encoder AND the pose decoder
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_dcdp_fusion_changes_pose(cfg, colvo_model):
    """Coupling test: with fusion on, pose output depends on depth features."""
    model, params, frames = colvo_model
    apply = jax.jit(model.apply)
    _, poses_a = apply(params, frames)
    # perturb only the depth encoder params; pose must change iff fused
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    perturbed = {
        k: (v + 0.05 * np.std(np.asarray(v)) if k[0] == "depth" and "encoder" in k[1] else v)
        for k, v in flat.items()
    }
    params_p = {"params": flax.traverse_util.unflatten_dict(perturbed)}
    _, poses_b = apply(params_p, frames)
    assert float(jnp.max(jnp.abs(poses_a - poses_b))) > 1e-7


@pytest.mark.slow  # two full ColVOModel grad compiles (~67 s CPU)
def test_remat_exact_grads_and_param_tree():
    """model.remat recomputes activations — exact math, identical params.

    Remat is a scheduling choice, not an approximation: the loss, grads,
    and the param tree (checkpoint compatibility) must match the plain
    forward bitwise-tolerantly on CPU.
    """
    frames = jnp.asarray(
        np.random.default_rng(3).random((1, 3, H, W, 3)).astype(np.float32))

    outs = {}
    for remat in (False, True):
        cfg_r = ModelConfig(dtype="float32", remat=remat)
        model = ColVOModel(cfg_r)
        params = model.init(jax.random.key(0), frames)

        def scalar(p):
            disps, poses = model.apply(p, frames)
            return jnp.mean(disps[0][0]) + jnp.mean(poses)

        loss, grads = jax.jit(jax.value_and_grad(scalar))(params)
        outs[remat] = (loss, grads, jax.tree.structure(params))

    assert outs[False][2] == outs[True][2]  # same param tree either way
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_adam_mu_dtype_bf16_moment_storage():
    """train.adam_mu_dtype=bfloat16 stores mu in bf16, nu in f32."""
    from colvo.config import ColvoConfig
    from colvo.runtime.train_step import make_optimizer

    cfg = ColvoConfig()
    cfg.train.adam_mu_dtype = "bfloat16"
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros((4, 4), jnp.float32)}
    state = tx.init(params)
    adam_state = state[1][0] if isinstance(state[1], tuple) else state[1]
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.float32
    # one update runs and keeps params f32
    g = {"w": jnp.ones((4, 4), jnp.float32)}
    updates, _ = tx.update(g, state, params)
    assert updates["w"].dtype == jnp.float32
