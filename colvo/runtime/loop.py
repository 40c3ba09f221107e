"""Training loop (SURVEY.md component R2, call stack §3.1).

Epochs over the snippet dataset with device prefetch, periodic checkpoint,
metrics, the NaN-abort guard (§5.3), the profiler window (§5.1), and DP
placement over the mesh (R3).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from colvo.config import ColvoConfig
from colvo.data import SnippetDataset, batch_iterator, prefetch_to_device
from colvo.runtime.checkpoint import CheckpointManager
from colvo.runtime.mesh import batch_sharding, make_mesh, replicate_tree
from colvo.runtime.metrics import AsyncMetricsLogger, MetricsWriter
from colvo.runtime.train_step import TrainState, init_state, make_optimizer, make_train_step

# Host→device prefetch depth for the host-side loaders. The grain
# iterator's checkpointable state history is sized from this (see below).
_PREFETCH = 2


def train(
    cfg: ColvoConfig,
    dataset: SnippetDataset,
    log_dir: str = "runs/train",
    max_steps: Optional[int] = None,
    eval_hook: Optional[Callable] = None,
    eval_hook_factory: Optional[Callable] = None,
    resume: bool = False,
):
    """Full training entry (BASELINE.json config 4). Returns final state."""
    # Sanitizer modes (SURVEY.md §5.2): surface the first NaN-producing op,
    # and/or pin reduced-precision matmul accumulation for bitwise replay.
    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.train.deterministic:
        jax.config.update("jax_default_matmul_precision", "highest")

    steps_per_epoch = max(1, len(dataset) // cfg.data.batch_size)
    total_steps = (
        max_steps if max_steps is not None else steps_per_epoch * cfg.train.epochs
    )

    rng = jax.random.key(cfg.train.seed)
    model, state = init_state(cfg, rng, steps_per_epoch)
    if eval_hook is None and eval_hook_factory is not None and cfg.train.eval_every_epochs > 0:
        eval_hook = eval_hook_factory(cfg, model)
    eval_every = max(1, steps_per_epoch * max(cfg.train.eval_every_epochs, 1))
    tx = make_optimizer(cfg, steps_per_epoch)
    step_fn = make_train_step(model, tx, cfg)

    mesh = make_mesh(cfg.mesh)
    if mesh.devices.size > 1:
        state = TrainState(
            replicate_tree(state.params, mesh),
            replicate_tree(state.opt_state, mesh),
            state.step,
        )
        sharding = batch_sharding(mesh, cfg.mesh.axis_name)
    else:
        sharding = None

    ckpt = CheckpointManager(
        cfg.train.ckpt_dir, keep=cfg.train.ckpt_keep,
        save_interval_steps=cfg.train.ckpt_every_steps,
    )
    start_step = 0
    restored_loader_state = None
    if resume and ckpt.latest_step() is not None:
        state, start_step, restored_loader_state = ckpt.restore(
            state, with_loader_state=True
        )
        print(f"resumed from step {start_step}")

    # Async logger: the blocking device→host metric fetch runs on a daemon
    # thread so the step loop never syncs (metrics.py module docstring).
    logger = AsyncMetricsLogger(MetricsWriter(log_dir),
                                fps_scale=float(cfg.data.batch_size))

    profile_window = None
    if cfg.train.profile_steps:
        a, _, b = cfg.train.profile_steps.partition(":")
        profile_window = (int(a), int(b))

    if cfg.data.loader == "device":
        # Device-resident corpus (D5 strongest form): frames pinned to HBM
        # as uint8 once; per-step host work is drawing B indices. Removes
        # host batch assembly + per-step H2D entirely (the host link is the
        # scarce resource; SURVEY.md §5.8 note in device_store.py).
        from colvo.data.device_store import DeviceSnippetStore

        store = DeviceSnippetStore(
            dataset.sequences,
            dataset.intrinsics,
            cfg.data.frame_offsets,
            sharding=sharding,
        )
        batches = store.batches(cfg.data, seed=cfg.train.seed)
    elif cfg.data.loader == "grain":
        from colvo.data.grain_loader import grain_batch_iterator

        # keep ties the iterator's retained state history to this loop's
        # prefetch depth: the checkpointed step trails the last-pulled
        # batch by at most _PREFETCH, plus margin for the async ckpt lag.
        batches = grain_batch_iterator(
            dataset, cfg.data, seed=cfg.train.seed, keep=_PREFETCH + 14
        )
    else:
        batches = batch_iterator(dataset, cfg.data, seed=cfg.train.seed)
    if cfg.data.loader == "grain" and restored_loader_state is not None:
        # Exact input-pipeline resume: the checkpoint carries the grain
        # iterator state at the saved step, so the stream continues
        # bitwise (SURVEY.md §5.3; no skip-ahead approximation).
        batches.set_state(restored_loader_state)
    else:
        # Skip already-consumed batches on resume (position-only
        # approximation for the non-checkpointable loaders).
        for _ in range(start_step % steps_per_epoch):
            next(batches)
    # Batches already consumed from the grain iterator before step
    # start_step+1 (0 after set_state; the skip-ahead count otherwise) —
    # offsets state_at keys at checkpoint time.
    grain_base = batches.count if cfg.data.loader == "grain" else 0

    if cfg.data.loader == "device":
        stream = batches  # already device-resident and sharded
    else:
        def shard(b):
            if sharding is None:
                return b
            from colvo.runtime.mesh import shard_batch

            return shard_batch(b, mesh, cfg.mesh.axis_name)

        stream = prefetch_to_device(
            map(shard, batches) if sharding else batches, size=_PREFETCH
        )

    # One background worker serializes checkpoint fetch+save off the loop.
    ckpt_pool = ThreadPoolExecutor(max_workers=1)
    step = start_step
    from collections import deque

    inflight = deque()  # (step, loss) handles awaiting retirement

    def drain_inflight(down_to: int = 0) -> None:
        """Retire queued loss handles (blocking fetch) down to ``down_to``
        entries; raise on any non-finite value. Called with 0 before the
        final checkpoint and at loop exit so a NaN inside the last
        dispatch-ahead windows cannot escape the dispatch-side stop and
        checkpoint poisoned params (ADVICE r2)."""
        while len(inflight) > down_to:
            s_old, v_old = inflight.popleft()
            if v_old is not None and not np.isfinite(float(np.asarray(v_old))):
                raise RuntimeError(f"aborting: non-finite loss at step {s_old}")

    import time as _time

    # Basin detect-and-restart (SURVEY.md §5.3; VERDICT r4 next #4): see
    # TrainConfig.restart_* for the signature and protocol. One blocking
    # scalar fetch per attempt; a restart reinits params+opt with a
    # derived seed and resets the step clock — same compiled step_fn, no
    # retrace (shapes unchanged). The data stream is NOT restarted: the
    # basin is an init phenomenon, and replaying the same batches under a
    # new init keeps the attempt comparison controlled.
    restarts_used = 0
    restart_checked = False

    wall_t0 = _time.time()
    for batch in stream:
        if step >= total_steps:
            break
        if profile_window and step == profile_window[0]:
            jax.profiler.start_trace(log_dir)
        state, metrics = step_fn(state, batch)
        step += 1

        if profile_window and step == profile_window[1]:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()

        if logger.bad_steps >= cfg.train.max_bad_steps:
            raise RuntimeError(
                f"aborting: {logger.bad_steps} consecutive non-finite losses"
            )
        if step % cfg.train.log_every == 0 or step == total_steps:
            # steps_per_sec/fps are stamped by the logger thread from its
            # own blocking-fetch completion times — honest wall clock with
            # zero main-thread device syncs (metrics.py::_run).
            logger.log(step, dict(metrics))
            # Bounded dispatch-ahead: async dispatch can run arbitrarily
            # far past execution, so a crawling device (e.g. a diverged
            # model driving a data-dependent kernel into its worst case)
            # accumulates an unbounded queue and every value-based guard
            # starves. Retire the loss from N windows back — one tunnel
            # round trip per window when healthy (<2% at current rates),
            # hard back-pressure + a dispatch-side NaN stop when not.
            inflight.append((step, metrics.get("loss/total")))
            drain_inflight(max(int(cfg.train.dispatch_ahead_windows), 1))

        if (cfg.train.restart_threshold > 0 and not restart_checked
                and restarts_used < cfg.train.restart_max
                and step >= cfg.train.restart_check_step):
            restart_checked = True
            name = cfg.train.restart_metric
            if name not in metrics:
                raise ValueError(
                    f"train.restart_metric {name!r} not in step metrics "
                    f"{sorted(metrics)}"
                )
            val = float(np.asarray(metrics[name]))  # one blocking fetch
            if val > cfg.train.restart_threshold:
                restarts_used += 1
                new_seed = cfg.train.seed + 1000 * restarts_used
                logger.log(step, {
                    "restart/attempt": float(restarts_used),
                    "restart/metric_value": val,
                    "restart/new_seed": float(new_seed),
                })
                print(f"[restart {restarts_used}/{cfg.train.restart_max}] "
                      f"{name}={val:.4g} > {cfg.train.restart_threshold} "
                      f"at step {step}; reinit with seed {new_seed}",
                      flush=True)
                inflight.clear()  # discarded attempt's loss handles
                _, state = init_state(cfg, jax.random.key(new_seed),
                                      steps_per_epoch)
                if mesh.devices.size > 1:
                    state = TrainState(
                        replicate_tree(state.params, mesh),
                        replicate_tree(state.opt_state, mesh),
                        state.step,
                    )
                ckpt_pool.submit(ckpt.reset)  # serialized after prior saves
                step = 0
                start_step = 0
                restart_checked = False
                wall_t0 = _time.time()
                continue

        if step % cfg.train.ckpt_every_steps == 0 or step == total_steps:
            if step == total_steps:
                # Final checkpoint: retire every queued loss first so a
                # late NaN aborts before poisoned params get saved.
                drain_inflight(0)
            # Snapshot on device (cheap copy; the live buffers get donated
            # to the next step), then fetch + save off the critical path —
            # a synchronous full-state fetch costs ~state_bytes/link_bw on
            # the training loop otherwise.
            snap = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, state)
            # Grain path: capture the iterator state matching exactly this
            # step's consumed-batch count NOW (the prefetcher has already
            # pulled ahead; state_at undoes that) — resume continues the
            # stream bitwise.
            lstate = (
                batches.state_at(grain_base + step - start_step)
                if cfg.data.loader == "grain"
                else None
            )
            if ckpt_pool is not None:
                ckpt_pool.submit(
                    lambda st=snap, sp=step, ls=lstate: ckpt.save(
                        sp, jax.tree.map(np.asarray, st), loader_state=ls
                    )
                )
            else:
                ckpt.save(step, jax.tree.map(np.asarray, snap), loader_state=lstate)

        if eval_hook is not None and step % eval_every == 0:
            # Hook contract: (step, state, writer) → optional scalar dict,
            # routed through the async logger so eval/* rows land in
            # metrics.jsonl next to the training rows; panels go straight
            # to writer.log_image (PNG + TB).
            scalars = eval_hook(step, state, logger.writer)
            if scalars:
                logger.log(step, scalars)

    drain_inflight(0)  # early break / non-aligned final step
    ckpt_pool.shutdown(wait=True)
    ckpt.wait()
    # End-of-run summary: the one deliberate device sync — total wall time
    # over executed (not just dispatched) steps is the unambiguous rate;
    # the async per-window steps_per_sec above is an off-critical-path
    # estimate only (metrics.py::_run).
    jax.block_until_ready(state.params)
    wall = _time.time() - wall_t0
    if step > start_step and wall > 0:
        logger.log(step, {
            "wall_steps_per_sec": (step - start_step) / wall,
            "wall_fps": (step - start_step) * cfg.data.batch_size / wall,
        })
    logger.close()
    return model, state
