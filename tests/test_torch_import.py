"""Golden parity tests for the torch family-checkpoint importer.

SURVEY.md §4.1/§5.4: the reference distributes weights in the family's
PyTorch format (README.md:17). These tests build the family networks in
torch (torchvision-ResNet + Monodepth2-style decoder naming — torchvision
itself is not installed, so the reference modules live here), randomize
their weights, run the importer, and assert the Flax ``norm="none"`` model
reproduces the torch forward to float tolerance — the strongest available
"same output fidelity" check with no reference code or weights obtainable.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from colvo.config import ModelConfig
from colvo.models import ColVOModel
from colvo.runtime.torch_import import (
    import_depth_decoder,
    import_family_checkpoint,
    import_pose_decoder,
    import_resnet_encoder,
)


# ----------------------------------------------------------- torch reference
# torchvision-faithful ResNet-18 (BasicBlock) with the standard state-dict
# naming: conv1/bn1/layer{1..4}.{0,1}.conv{1,2}|bn{1,2}|downsample.{0,1}.


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TorchResNet18(tnn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for li, w in enumerate(widths):
            blocks = []
            for bi in range(2):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(TorchBasicBlock(cin, w, stride))
                cin = w
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        feats = []
        x = F.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
            feats.append(x)
        return feats


class TorchConvBlock(tnn.Module):
    """Monodepth2 ConvBlock: ReflectionPad2d(1) + 3×3 conv + ELU, saved
    under ``.conv.conv`` (Conv3x3 wraps the padded conv)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Module()
        self.conv.pad = tnn.ReflectionPad2d(1)
        self.conv.conv = tnn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return F.elu(self.conv.conv(self.conv.pad(x)))


class TorchDispConv(tnn.Module):
    """Monodepth2 Conv3x3 disparity head, saved under ``.conv``."""

    def __init__(self, cin):
        super().__init__()
        self.pad = tnn.ReflectionPad2d(1)
        self.conv = tnn.Conv2d(cin, 1, 3)

    def forward(self, x):
        return torch.sigmoid(self.conv(self.pad(x)))


class TorchDepthDecoder(tnn.Module):
    """Monodepth2 depth decoder: decoder.0..9 upconvs, decoder.10..13 heads."""

    ENC = (64, 64, 128, 256, 512)
    DEC = (16, 32, 64, 128, 256)

    def __init__(self, n_scales=4):
        super().__init__()
        mods = []
        cin = self.ENC[-1]
        for i in range(4, -1, -1):
            mods.append(TorchConvBlock(cin, self.DEC[i]))
            cin = self.DEC[i] + (self.ENC[i - 1] if i > 0 else 0)
            mods.append(TorchConvBlock(cin, self.DEC[i]))
            cin = self.DEC[i]
        for s in range(n_scales):
            mods.append(TorchDispConv(self.DEC[s]))
        self.decoder = tnn.ModuleList(mods)
        self.n_scales = n_scales

    def forward(self, feats):
        outputs = {}
        x = feats[-1]
        k = 0
        for i in range(4, -1, -1):
            x = self.decoder[k](x)
            k += 1
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.decoder[k](x)
            k += 1
        # heads run on the stored per-level features; rebuild them cheaply
        # by re-walking (family keeps them during the loop — equivalent)
        return outputs, x

    def forward_all(self, feats):
        outputs = {}
        x = feats[-1]
        k = 0
        for i in range(4, -1, -1):
            x = self.decoder[k](x)
            k += 1
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.decoder[k](x)
            k += 1
            if i < self.n_scales:
                outputs[i] = self.decoder[10 + i](x)
        return outputs


class TorchPoseDecoder(tnn.Module):
    """Monodepth2 pose decoder (net.0..3) predicting K=2 poses (12 ch)."""

    def __init__(self, k=2):
        super().__init__()
        self.net = tnn.ModuleList(
            [
                tnn.Conv2d(512, 256, 1),
                tnn.Conv2d(256, 256, 3, 1, 1),
                tnn.Conv2d(256, 256, 3, 1, 1),
                tnn.Conv2d(256, 6 * k, 1),
            ]
        )
        self.k = k

    def forward(self, x):
        x = F.relu(self.net[0](x))
        x = F.relu(self.net[1](x))
        x = F.relu(self.net[2](x))
        x = self.net[3](x)
        out = 0.01 * x.mean(3).mean(2).view(-1, self.k, 6)
        return out[:, 0, :3], out[:, 0, 3:]  # first predicted pose


def _randomize_bn(model):
    """Give BatchNorms non-trivial running stats so folding is exercised."""
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) * 2 + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.2)


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


@pytest.fixture(scope="module")
def family():
    torch.manual_seed(0)
    enc = TorchResNet18(3).eval()
    dec = TorchDepthDecoder().eval()
    pose_enc = TorchResNet18(6).eval()
    pose_dec = TorchPoseDecoder().eval()
    for m in (enc, pose_enc):
        _randomize_bn(m)
    return enc, dec, pose_enc, pose_dec


@pytest.fixture(scope="module")
def jax_model_and_params(family):
    enc, dec, pose_enc, pose_dec = family
    cfg = ModelConfig(dtype="float32", norm="none", dcdp_fusion=False)
    model = ColVOModel(cfg)
    template = jax.jit(model.init)(jax.random.key(0),
                                   jnp.zeros((1, 2, 64, 96, 3)))
    params = import_family_checkpoint(
        template,
        enc.state_dict(),
        dec.state_dict(),
        pose_enc.state_dict(),
        pose_dec.state_dict(),
    )
    return model, params


def test_encoder_forward_parity(family, jax_model_and_params):
    enc, *_ = family
    model, params = jax_model_and_params
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        t_feats = enc(_nchw(x))

    def run(params, img):
        return model.apply(params, img, method=model.depth)

    disps, bneck = jax.jit(run)(params, jnp.asarray(x))
    t_bneck = np.transpose(t_feats[-1].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(bneck), t_bneck, rtol=2e-4, atol=2e-4)


def test_depth_forward_parity(family, jax_model_and_params):
    enc, dec, *_ = family
    model, params = jax_model_and_params
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        t_disps = dec.forward_all(enc(_nchw(x)))

    disps, _ = jax.jit(lambda p, i: model.apply(p, i, method=model.depth))(
        params, jnp.asarray(x)
    )
    for s in range(4):
        t = np.transpose(t_disps[s].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(disps[s]), t, rtol=2e-4, atol=2e-4)


def test_pose_forward_parity(family, jax_model_and_params):
    _, _, pose_enc, pose_dec = family
    model, params = jax_model_and_params
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        feats = pose_enc(torch.cat([_nchw(a), _nchw(b)], 1))
        t_aa, t_tr = pose_dec(feats[-1])

    aa, tr = jax.jit(lambda p, x, y: model.apply(p, x, y, None, method=model.pose))(
        params, jnp.asarray(a), jnp.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(aa), t_aa.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr), t_tr.numpy(), rtol=1e-4, atol=1e-5)


def test_import_shape_guard(family, jax_model_and_params):
    """Importing resnet weights into a mismatched template must raise."""
    enc, dec, *_ = family
    model, params = jax_model_and_params
    bad = {k: v for k, v in enc.state_dict().items()}
    bad["conv1.weight"] = torch.zeros(64, 4, 7, 7)
    with pytest.raises(ValueError):
        import_family_checkpoint(params, bad, dec.state_dict())


def test_subtree_importers_standalone(family):
    """The per-module importers return the documented key layout."""
    enc, dec, pose_enc, pose_dec = family
    e = import_resnet_encoder(enc.state_dict())
    assert set(e) == {"Conv_0"} | {f"BasicBlock_{i}" for i in range(8)}
    assert e["BasicBlock_2"]["Conv_2"]["kernel"].shape == (1, 1, 64, 128)
    d = import_depth_decoder(dec.state_dict())
    assert d["dispconv_0"]["kernel"].shape == (3, 3, 16, 1)
    p = import_pose_decoder(pose_dec.state_dict())
    assert p["pose_2"]["kernel"].shape == (1, 1, 256, 6)  # 12-ch head sliced
