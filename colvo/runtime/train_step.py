"""Jitted train step (SURVEY.md component R1, call stack §3.1).

One XLA program per step: coupled DCDP forward over the snippet batch →
total loss (LCC + SSIM/L1 + smoothness + geometric consistency) →
``jax.grad`` → global-norm clip → Adam update. Donated state, bf16 conv
compute with fp32 params/optimizer (BASELINE.json config 4).

Data parallelism: the same jitted function runs SPMD over the mesh —
batch arrays arrive sharded on the ``data`` axis, params replicated, and
XLA inserts the gradient all-reduce over ICI (SURVEY.md §5.8). No remat:
at the production shape (B=12, 256×320, bf16) the full fwd+bwd fits HBM
comfortably, and the 8 warp+loss evaluations per step (SURVEY.md §7 hard
part 5) are bounded by the fused K1 kernel / native-scale geo protocol
rather than by rematerialization.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from colvo.config import ColvoConfig
from colvo.losses import snippet_loss
from colvo.models import ColVOModel


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: ColvoConfig, steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    """Adam + global-norm clipping + family-standard step-decay schedule."""
    decay_step = cfg.train.lr_decay_epochs * steps_per_epoch
    schedule = optax.piecewise_constant_schedule(
        init_value=cfg.train.lr,
        boundaries_and_scales={decay_step: cfg.train.lr_decay_factor},
    )
    if cfg.train.warmup_steps > 0:
        # Linear LR warmup (basin-robustness lever, VERDICT r4 next #4).
        # join_schedules offsets the tail schedule by warmup_steps, so the
        # family decay lands warmup_steps later — irrelevant at epoch-15
        # decay vs a few-hundred-step warmup, noted for exactness.
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.train.lr, cfg.train.warmup_steps),
             schedule],
            [cfg.train.warmup_steps],
        )
    if cfg.train.adam_mu_dtype not in ("", "float32", "bfloat16"):
        # Mirror loss.compute_dtype's validation: 'bf16'/'float16' must not
        # silently fall back to float32 (ADVICE r4).
        raise ValueError(
            "train.adam_mu_dtype must be ''|float32|bfloat16, "
            f"got {cfg.train.adam_mu_dtype!r}"
        )
    mu_dtype = jnp.bfloat16 if cfg.train.adam_mu_dtype == "bfloat16" else None
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.train.weight_decay,
                    mu_dtype=mu_dtype)
        if cfg.train.weight_decay > 0
        else optax.adam(schedule, mu_dtype=mu_dtype),
    )
    return tx


def init_state(
    cfg: ColvoConfig, rng: jax.Array, steps_per_epoch: int = 1000
) -> Tuple[ColVOModel, TrainState]:
    """Build the model and a fresh TrainState."""
    model = ColVOModel(cfg.model)
    n_frames = 1 + len(cfg.data.frame_offsets)
    dummy = jnp.zeros((1, n_frames, cfg.data.height, cfg.data.width, 3), jnp.float32)
    params = jax.jit(model.init)(rng, dummy)
    tx = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    return model, TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_train_step(model: ColVOModel, tx: optax.GradientTransformation, cfg: ColvoConfig):
    """Build the jitted step: (state, batch) → (state, metrics).

    ``batch`` = {frames, frames_clean, k}: frames (B, F, H, W, 3), k (3, 3).
    """

    def loss_fn(params, batch, geo_scale):
        disps, poses = model.apply(params, batch["frames"])
        k = batch["k"]
        loss, aux = snippet_loss(
            disps,
            poses,
            batch["frames"],
            k,
            jnp.linalg.inv(k),
            cfg.loss,
            cfg.model,
            frames_clean=batch.get("frames_clean"),
            geo_scale=geo_scale,
        )
        aux.pop("depth/full", None)  # metrics only; keep the step output small
        return loss, aux

    def _geo_scale(step):
        if cfg.loss.geo_ramp_steps > 0:
            return jnp.minimum(1.0, (step + 1.0) / cfg.loss.geo_ramp_steps)
        return 1.0

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, _geo_scale(state.step))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(aux)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_scan_train(model: ColVOModel, tx: optax.GradientTransformation,
                    cfg: ColvoConfig, n_steps: int):
    """Build a jitted K-step training chunk over a device-resident store.

    ``lax.scan`` folds ``n_steps`` full train steps — on-device batch index
    sampling, uint8 gather, augmentation, fwd+bwd+update — into ONE XLA
    program, so the host dispatches once per chunk instead of once per
    step. On a tunneled/high-latency host↔device link (this environment:
    ~0.25–0.8 s per dispatch) this is the difference between 757 ms/step
    and the true ~7 ms/step; on a local host it still removes dispatch
    overhead and lets XLA overlap chunk boundaries.

    Returns ``chunk_fn(state, frames_u8, table, key) → (state, metrics)``
    with metrics stacked over the chunk's steps. Sampling is uniform with
    replacement (statistically equivalent to shuffling at these corpus
    sizes; per-epoch permutation order is not load-bearing for SGD).
    """
    from colvo.data.device_store import device_augment

    def loss_fn(params, batch, geo_scale):
        disps, poses = model.apply(params, batch["frames"])
        k = batch["k"]
        loss, aux = snippet_loss(
            disps, poses, batch["frames"], k, jnp.linalg.inv(k),
            cfg.loss, cfg.model, frames_clean=batch["frames_clean"],
            geo_scale=geo_scale,
        )
        aux.pop("depth/full", None)
        return loss, aux

    def one_step(carry, key, frames_u8, table, k_mat):
        state = carry
        k_idx, k_aug = jax.random.split(key)
        idx = jax.random.randint(k_idx, (cfg.data.batch_size,), 0, table.shape[0])
        clean = frames_u8[table[idx]].astype(jnp.float32) / 255.0
        if cfg.data.augment:
            aug, clean = device_augment(clean, k_aug, cfg.data)
        else:
            aug = clean
        batch = {"frames": aug, "frames_clean": clean, "k": k_mat}
        if cfg.loss.geo_ramp_steps > 0:
            geo_scale = jnp.minimum(1.0, (state.step + 1.0) / cfg.loss.geo_ramp_steps)
        else:
            geo_scale = 1.0
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, geo_scale)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(aux)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    @partial(jax.jit, donate_argnums=(0,), static_argnums=())
    def chunk_fn(state: TrainState, frames_u8, table, k_mat, key):
        keys = jax.random.split(key, n_steps)
        body = partial(one_step, frames_u8=frames_u8, table=table, k_mat=k_mat)
        return jax.lax.scan(body, state, keys)

    return chunk_fn
