"""torch→jax family-checkpoint import (SURVEY.md §5.4).

The reference distributes trained weights (/root/reference/README.md:17,
Baidu link) in the family's PyTorch format: four per-module state dicts —
``encoder.pth`` / ``depth.pth`` (torchvision ResNet + Monodepth2-style
depth decoder) and ``pose_encoder.pth`` / ``pose.pth`` (6-channel ResNet +
pose decoder). This module maps those into the rebuilt Flax model so family
checkpoints can be evaluated for parity (SURVEY.md §4.1 golden tests)
whenever the weights become obtainable.

Import target is the ``norm="none"`` model variant (ModelConfig.norm):
family encoders are Conv→BatchNorm and our TPU model is norm-stateless, so
each BatchNorm folds exactly into its preceding conv's weight + bias
(:func:`colvo.runtime.checkpoint.fold_batchnorm`). Convolution geometry
(torch-style explicit padding, reflection-padded decoder convs) matches the
family bit-for-bit up to float summation order — asserted against a torch
reference forward in ``tests/test_torch_import.py``.

No reference code exists to port (SURVEY.md §0); the key layout implemented
here is the de-facto family standard (Monodepth2 ``resnet_encoder.py`` /
``depth_decoder.py`` / ``pose_decoder.py`` naming).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np

from colvo.runtime.checkpoint import fold_batchnorm, torch_conv_to_hwio

# blocks per stage (must mirror colvo.models.encoder._STAGES)
_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


def _np(x) -> np.ndarray:
    """torch tensor or array-like → float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            k = k[len(prefix):]
        out[k] = v
    return out


def _conv_bn(sd: Mapping[str, Any], conv_key: str, bn_key: str):
    """(HWIO folded kernel, bias) for a torch conv followed by a BatchNorm."""
    w = torch_conv_to_hwio(_np(sd[f"{conv_key}.weight"]))
    return fold_batchnorm(
        w,
        _np(sd[f"{bn_key}.weight"]),
        _np(sd[f"{bn_key}.bias"]),
        _np(sd[f"{bn_key}.running_mean"]),
        _np(sd[f"{bn_key}.running_var"]),
    )


def import_resnet_encoder(
    state_dict: Mapping[str, Any], num_layers: int = 18
) -> Dict[str, Any]:
    """torchvision ResNet-18/34 state dict → ``ResNetEncoder(norm="none")``
    params subtree (BN folded into conv weight+bias).

    Accepts both bare torchvision keys (``conv1.weight``) and the family's
    wrapped form (``encoder.conv1.weight``); non-tensor bookkeeping entries
    (``height``/``width``/...) and the classifier head (``fc.*``) are ignored.
    """
    sd = _strip_prefix(state_dict, "encoder.")
    out: Dict[str, Any] = {}

    w, b = _conv_bn(sd, "conv1", "bn1")
    out["Conv_0"] = {"kernel": w, "bias": b}

    stages = _STAGES[num_layers]
    flat_block = 0
    for stage_idx, blocks in enumerate(stages):
        for block_idx in range(blocks):
            t = f"layer{stage_idx + 1}.{block_idx}"
            params: Dict[str, Any] = {}
            for n in (1, 2):
                w, b = _conv_bn(sd, f"{t}.conv{n}", f"{t}.bn{n}")
                params[f"Conv_{n - 1}"] = {"kernel": w, "bias": b}
            if f"{t}.downsample.0.weight" in sd:
                w, b = _conv_bn(sd, f"{t}.downsample.0", f"{t}.downsample.1")
                params["Conv_2"] = {"kernel": w, "bias": b}
            out[f"BasicBlock_{flat_block}"] = params
            flat_block += 1
    return out


def import_depth_decoder(
    state_dict: Mapping[str, Any], n_scales: int = 4
) -> Dict[str, Any]:
    """Family depth-decoder state dict → ``DepthDecoder`` params subtree.

    Family layout (Monodepth2): ``decoder.{0..9}`` are the ten upconv
    ConvBlocks in top-down insertion order — exactly our ``ConvBlock_{0..9}``
    — and ``decoder.{10..}`` are the disparity heads for scales 0..n-1.
    """
    out: Dict[str, Any] = {}
    for i in range(10):
        w = torch_conv_to_hwio(_np(state_dict[f"decoder.{i}.conv.conv.weight"]))
        b = _np(state_dict[f"decoder.{i}.conv.conv.bias"])
        out[f"ConvBlock_{i}"] = {"Conv_0": {"kernel": w, "bias": b}}
    for s in range(n_scales):
        w = torch_conv_to_hwio(_np(state_dict[f"decoder.{10 + s}.conv.weight"]))
        b = _np(state_dict[f"decoder.{10 + s}.conv.bias"])
        out[f"dispconv_{s}"] = {"kernel": w, "bias": b}
    return out


def import_pose_decoder(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Family pose-decoder state dict → ``PoseDecoder`` params subtree.

    Family layout: ``net.0`` squeeze 1×1, ``net.1``/``net.2`` 3×3 convs,
    ``net.3`` the 6·K-channel head (K = frames predicted per pass; family
    default 2). Our head predicts the single target→source pose, so only
    the first 6 output channels are taken — the family's own VO evaluation
    uses exactly that slice (pose index 0).
    """
    names = ("squeeze", "pose_0", "pose_1", "pose_2")
    out: Dict[str, Any] = {}
    for i, name in enumerate(names):
        w = torch_conv_to_hwio(_np(state_dict[f"net.{i}.weight"]))
        b = _np(state_dict[f"net.{i}.bias"])
        if name == "pose_2" and w.shape[-1] != 6:
            assert w.shape[-1] % 6 == 0, w.shape
            w, b = w[..., :6], b[:6]
        out[name] = {"kernel": w, "bias": b}
    return out


def import_family_checkpoint(
    params_template: Any,
    encoder_sd: Mapping[str, Any],
    depth_sd: Mapping[str, Any],
    pose_encoder_sd: Optional[Mapping[str, Any]] = None,
    pose_sd: Optional[Mapping[str, Any]] = None,
    num_layers: int = 18,
    n_scales: int = 4,
) -> Any:
    """Fill a ``ColVOModel`` params template with family torch weights.

    ``params_template`` is ``model.init(...)`` output for a model built with
    ``ModelConfig(norm="none")``. Subtrees present in the checkpoint are
    replaced; anything the family doesn't have (the DCDP fusion convs —
    the reference's coupling is ours to train) keeps its template values.
    Imported leaves are shape-checked against the template.
    """
    import jax

    params = jax.tree_util.tree_map(lambda x: x, params_template)  # copy
    p = params["params"]
    p["depth"]["encoder"] = _checked(
        p["depth"]["encoder"], import_resnet_encoder(encoder_sd, num_layers)
    )
    p["depth"]["decoder"] = _checked(
        p["depth"]["decoder"], import_depth_decoder(depth_sd, n_scales)
    )
    if pose_encoder_sd is not None:
        p["pose_encoder"] = _checked(
            p["pose_encoder"], import_resnet_encoder(pose_encoder_sd, num_layers)
        )
    if pose_sd is not None:
        p["pose_decoder"] = _checked(
            p["pose_decoder"], import_pose_decoder(pose_sd)
        )
    return params


def _checked(template: Mapping[str, Any], imported: Dict[str, Any]) -> Dict[str, Any]:
    """Verify the imported subtree's keys/shapes match the template's."""
    import flax

    t = flax.traverse_util.flatten_dict(dict(template), sep="/")
    m = flax.traverse_util.flatten_dict(imported, sep="/")
    missing = sorted(set(t) - set(m))
    extra = sorted(set(m) - set(t))
    if missing or extra:
        raise ValueError(
            f"family checkpoint mismatch: missing={missing[:5]} extra={extra[:5]}"
        )
    for k in t:
        if tuple(t[k].shape) != tuple(np.shape(m[k])):
            raise ValueError(f"{k}: template {t[k].shape} vs import {np.shape(m[k])}")
    return imported


def load_family_checkpoint_dir(path: str) -> Dict[str, Dict[str, Any]]:
    """Load the family's four ``.pth`` files from a directory.

    Returns ``{"encoder": sd, "depth": sd, "pose_encoder": sd?, "pose": sd?}``
    (pose files optional — depth-only releases exist in the family).
    """
    import torch

    out: Dict[str, Dict[str, Any]] = {}
    for name in ("encoder", "depth", "pose_encoder", "pose"):
        f = os.path.join(path, f"{name}.pth")
        if os.path.exists(f):
            out[name] = torch.load(f, map_location="cpu", weights_only=True)
        elif name in ("encoder", "depth"):
            raise FileNotFoundError(f)
    return out
