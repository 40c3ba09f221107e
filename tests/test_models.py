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
    params = enc.init(jax.random.key(0), _img())
    feats = enc.apply(params, _img())
    assert len(feats) == 5
    expect = [(H // 2, W // 2, 64), (H // 4, W // 4, 64), (H // 8, W // 8, 128),
              (H // 16, W // 16, 256), (H // 32, W // 32, 512)]
    for f, (h, w, c) in zip(feats, expect):
        assert f.shape == (2, h, w, c), f.shape


def test_encoder_param_count_resnet18_scale(cfg):
    enc = ResNetEncoder(18, dtype=jnp.float32)
    params = enc.init(jax.random.key(0), _img())
    n = sum(p.size for p in jax.tree.leaves(params))
    # torchvision resnet18 convs ≈ 11.2 M; ours (GroupNorm affine ≈ BN affine)
    assert 10e6 < n < 13e6, n


def test_depthnet_multiscale_disp(cfg):
    net = DepthNet(cfg)
    params = net.init(jax.random.key(0), _img())
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
    params = net.init(jax.random.key(0), _img(), _img())
    aa, tr = jax.jit(lambda p, a, b: net.apply(p, a, b))(params, _img(), _img())
    assert aa.shape == (2, 3) and tr.shape == (2, 3)
    # 0.01 scaling keeps init-time poses near identity
    assert float(jnp.max(jnp.abs(aa))) < 0.1


@pytest.mark.slow
def test_colvo_model_forward_and_grads(cfg):
    model = ColVOModel(cfg)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.random((2, 3, H, W, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), frames)
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


def test_dcdp_fusion_changes_pose(cfg):
    """Coupling test: with fusion on, pose output depends on depth features."""
    model = ColVOModel(cfg)
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.random((1, 2, H, W, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), frames)
    _, poses_a = model.apply(params, frames)
    # perturb only the depth encoder params; pose must change iff fused
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    perturbed = {
        k: (v + 0.05 * np.std(np.asarray(v)) if k[0] == "depth" and "encoder" in k[1] else v)
        for k, v in flat.items()
    }
    params_p = {"params": flax.traverse_util.unflatten_dict(perturbed)}
    _, poses_b = model.apply(params_p, frames)
    assert float(jnp.max(jnp.abs(poses_a - poses_b))) > 1e-7
