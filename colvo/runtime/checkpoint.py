"""Checkpointing (SURVEY.md component R4, §5.4).

Orbax ``CheckpointManager``: async save of {params, opt_state, step} with a
keep-N policy and resume; plus an inference-only export and a torch→jax
weight importer for family-format checkpoints (the reference distributes
trained weights, /root/reference/README.md:17 — a portable weight format is
part of the capability surface).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

import orbax.checkpoint as ocp

from colvo.runtime.train_step import TrainState


class CheckpointManager:
    """Thin wrapper around orbax CheckpointManager for TrainState trees."""

    def __init__(self, directory: str, keep: int = 3, save_interval_steps: int = 1):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, save_interval_steps=save_interval_steps
        )
        self._dir = directory
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: TrainState,
             loader_state: Optional[bytes] = None) -> None:
        """Save the train state; optionally the input-pipeline iterator
        state (grain ``get_state()`` bytes) alongside it, so resume
        continues the batch stream exactly (SURVEY.md §5.3/§5.4)."""
        import base64

        items = {"state": ocp.args.StandardSave(state._asdict())}
        if loader_state is not None:
            items["loader"] = ocp.args.JsonSave(
                {"grain_b64": base64.b64encode(loader_state).decode("ascii")}
            )
        self._mgr.save(step, args=ocp.args.Composite(**items))

    def restore(
        self, state_like: TrainState, step: Optional[int] = None,
        with_loader_state: bool = False,
    ):
        """Restore the latest (or given) step into the structure of
        ``state_like``. Returns (state, step), or (state, step,
        loader_state_bytes_or_None) when ``with_loader_state``."""
        import base64

        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        # Item presence from the on-disk layout (directory/<step>/<item>):
        # checkpoints written before the loader-state upgrade were saved as
        # a single unnamed item (plain StandardSave → on-disk "default");
        # Composite restore raises on those, so detect the legacy layout
        # and restore through the single-item path.
        step_dir = os.path.join(self._dir, str(step))
        legacy = not os.path.isdir(os.path.join(step_dir, "state"))
        if legacy:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_like._asdict())
            )
            state = TrainState(**restored)
            return (state, step, None) if with_loader_state else (state, step)
        has_loader = os.path.isdir(os.path.join(step_dir, "loader"))
        items = {"state": ocp.args.StandardRestore(state_like._asdict())}
        if has_loader:
            items["loader"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**items))
        state = TrainState(**restored["state"])
        if not with_loader_state:
            return state, step
        loader = restored.get("loader") if has_loader else None
        loader_state = (
            base64.b64decode(loader["grain_b64"]) if loader else None
        )
        return state, step, loader_state

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def reset(self) -> None:
        """Delete every saved step. Basin detect-and-restart (R2) discards
        a failed attempt's checkpoints so the retry can re-save the same
        step numbers without Orbax step-exists conflicts."""
        self._mgr.wait_until_finished()
        for s in list(self._mgr.all_steps()):
            self._mgr.delete(s)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def export_params(params: Any, path: str) -> str:
    """Export inference-only weights as a flat .npz (portable, no Orbax
    needed to load — the README.md:17 'distributable weights' analog).

    ``np.savez`` silently appends ``.npz`` to other suffixes, so the
    extension is normalized here; returns the actual path written."""
    import flax

    if not path.endswith(".npz"):
        path = path + ".npz"
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})
    return path


def load_params(path: str) -> Any:
    """Load a .npz exported by :func:`export_params` back into a pytree."""
    import flax
    import os

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return flax.traverse_util.unflatten_dict(flat, sep="/")


# --------------------------------------------------------------- torch import


def fold_batchnorm(
    conv_w: np.ndarray, bn_gamma, bn_beta, bn_mean, bn_var, eps: float = 1e-5
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BatchNorm statistics into the preceding conv (SURVEY.md M1 note).

    Our TPU model is norm-stateless (GroupNorm); family torchvision encoders
    use Conv→BN. For weight import, BN folds exactly into the conv:
    ``w' = w·γ/√(σ²+ε)`` (per out-channel), ``b' = β − γ·μ/√(σ²+ε)``.

    Args:
        conv_w: (kh, kw, cin, cout) HWIO conv kernel.
    Returns:
        (folded_w, folded_b).
    """
    scale = bn_gamma / np.sqrt(bn_var + eps)
    w = conv_w * scale[None, None, None, :]
    b = bn_beta - bn_mean * scale
    return w.astype(conv_w.dtype), b.astype(conv_w.dtype)


def torch_conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight → flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))
