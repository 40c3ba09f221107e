"""Train-step timing: serial-chain slope protocol (the only honest one here).

On this environment's "axon" TPU platform ``jax.block_until_ready`` can
return before execution finishes, so block-based timings are meaningless
(they once reported a 340 ms step as 2 ms). The reliable protocol:

  1. thread the train state serially through N dispatched steps (a real
     data dependency — nothing can be elided or overlapped away),
  2. force completion with ONE ``float()`` fetch of the last loss,
  3. measure at two N values and take the slope — the per-step time with
     the constant fetch/dispatch overhead cancelled.

Usage: python scripts/bench_train.py [--n1 10 --n2 50] [--<config overrides>]
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

    def intflag(name, default):
        if name in argv:
            i = argv.index(name)
            v = int(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    n1, n2 = intflag("--n1", 10), intflag("--n2", 50)
    cfg = ColvoConfig()
    if argv:
        cfg.apply_overrides(argv)

    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    # enough snippets for ONE batch at any requested batch size (a 16-frame
    # sequence yields ~14 snippets — B>=15 used to hang in batch_iterator)
    seq = render_sequence(
        n_frames=max(16, cfg.data.batch_size + 4),
        height=cfg.data.height, width=cfg.data.width, seed=0,
    )
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = jax.tree.map(jnp.asarray, next(batch_iterator(ds, cfg.data, seed=0)))

    state, m = step_fn(state, batch)
    float(m["loss/total"])  # compile + warm (real fetch)

    def chain(n):
        nonlocal state
        t0 = time.time()
        last = None
        for _ in range(n):
            state, m = step_fn(state, batch)
            last = m["loss/total"]
        float(last)  # one real fetch completes the chain
        return time.time() - t0

    best = float("inf")
    for _ in range(2):
        t1, t2 = chain(n1), chain(n2)
        best = min(best, (t2 - t1) / (n2 - n1))
    print(json.dumps({
        "step_ms": round(best * 1e3, 2),
        "steps_per_s": round(1.0 / best, 1),
        "batch": cfg.data.batch_size,
        "hw": [cfg.data.height, cfg.data.width],
        "protocol": "serial-chain slope",
    }))


if __name__ == "__main__":
    main()
