"""Train-step throughput microbenchmark (dispatched pipeline protocol).

Protocol: dispatch N independent step executions back-to-back with NO
per-step host sync, then block once at the end — per the measured behavior
of this environment's tunneled host↔device link, where every sync costs
~0.8 s (a synced loop measures the tunnel: 789 ms/step vs the true ~2 ms).
Platform caveat recorded 2026-08-17: wrapping the step in an outer
jit+``lax.scan`` compiles to a pathologically slow program on the "axon"
TPU platform (~170× slower than dispatched), and ``block_until_ready`` has
returned early on some scan outputs — so this script intentionally times
dispatched executions, which match the production loop's observed
steps/s.

Usage: python scripts/bench_train.py [--steps 50] [--<config overrides>]
Prints one JSON line: {"step_ms": ..., "steps_per_s": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, batch_iterator, render_sequence
    from colvo.runtime import init_state, make_optimizer, make_train_step

    argv = list(sys.argv[1:] if argv is None else argv)
    n_steps = 50
    if "--steps" in argv:
        i = argv.index("--steps")
        n_steps = int(argv[i + 1])
        del argv[i : i + 2]
    cfg = ColvoConfig()
    if argv:
        cfg.apply_overrides(argv)

    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    seq = render_sequence(
        n_frames=16, height=cfg.data.height, width=cfg.data.width, seed=0
    )
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = jax.tree.map(jnp.asarray, next(batch_iterator(ds, cfg.data, seed=0)))

    # warm/compile (donated state: keep threading the returned one)
    state, m = step_fn(state, batch)
    jax.block_until_ready(m["loss/total"])

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = []
        for _ in range(n_steps):
            state, m = step_fn(state, batch)
            outs.append(m["loss/total"])
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / n_steps)
    print(json.dumps({
        "step_ms": round(best * 1e3, 3),
        "steps_per_s": round(1.0 / best, 1),
        "batch": cfg.data.batch_size,
        "hw": [cfg.data.height, cfg.data.width],
    }))


if __name__ == "__main__":
    main()
