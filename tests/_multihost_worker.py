"""Worker process for the 2-process multi-host SPMD smoke test
(SURVEY.md §5.8; launched by tests/test_multihost.py — not a test file).

Each process fakes 2 CPU devices; after ``maybe_init_distributed`` the
global mesh spans 4 devices across the 2 processes and one DP train step
runs SPMD, gradients all-reduced over the (simulated) DCN boundary.
Prints ``MULTIHOST_OK loss=<x>`` on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=2"
    ).strip()


def main():
    # The axon TPU plugin force-prepends itself to JAX_PLATFORMS; the
    # config update (before any backend init) is the reliable CPU pin
    # (same recipe as tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from colvo.runtime.mesh import maybe_init_distributed

    assert maybe_init_distributed(), "distributed init did not engage"

    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2, jax.local_device_count()

    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, batch_iterator, render_sequence
    from colvo.runtime import (
        TrainState,
        batch_sharding,
        init_state,
        make_mesh,
        make_optimizer,
        make_train_step,
        replicate_tree,
    )

    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.model.n_scales = 2
    cfg.data.height = cfg.data.width = 32
    cfg.data.batch_size = 8
    cfg.data.frame_offsets = (1,)
    cfg.data.augment = False

    mesh = make_mesh()  # all 8 global devices
    model, state = init_state(cfg, jax.random.key(0))
    state = TrainState(
        replicate_tree(state.params, mesh),
        replicate_tree(state.opt_state, mesh),
        state.step,
    )
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)

    # Same deterministic batch on both processes; each contributes its
    # local quarter via make_array_from_process_local_data (the
    # multi-process analog of shard_batch's device_put).
    seq = render_sequence(n_frames=12, height=32, width=32, seed=11)
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = next(batch_iterator(ds, cfg.data, seed=0))
    bs = batch_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == cfg.data.batch_size:
            n_local = x.shape[0] // jax.process_count()
            lo = jax.process_index() * n_local
            return jax.make_array_from_process_local_data(
                bs, x[lo : lo + n_local]
            )
        return jax.make_array_from_process_local_data(rep, x)

    gbatch = jax.tree.map(place, batch)

    # The first executed cross-process collective creates the Gloo
    # context under a fixed ~30 s connect deadline measured from when the
    # FIRST process arrives — but two 1-core workers can be minutes apart
    # in compile progress. So: compile everything ahead (lower+compile
    # executes nothing → no Gloo), line both processes up on the
    # coordination-service barrier (its timeout is ours to choose), and
    # only then execute. Arrival skew at the collective is then
    # milliseconds, not compile-minutes.
    warm = jax.jit(lambda f: f.sum())
    warm_exe = warm.lower(gbatch["frames"]).compile()
    step_exe = step_fn.lower(state, gbatch).compile()

    from colvo.runtime import cross_process_barrier

    assert cross_process_barrier("smoke-pre-collective", timeout_s=480.0)

    float(np.asarray(jax.device_get(warm_exe(gbatch["frames"]))))

    state, metrics = step_exe(state, gbatch)
    loss = float(np.asarray(jax.device_get(metrics["loss/total"])))
    assert np.isfinite(loss), loss
    print(f"MULTIHOST_OK loss={loss:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
