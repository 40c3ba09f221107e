"""Benchmark: coupled depth+pose inference throughput on one TPU chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "fps/chip", "vs_baseline": N}``

The north-star target is >30 coupled depth+pose fps/chip on colonoscopy
video (BASELINE.json; the reference publishes no speed numbers, so
``vs_baseline`` is value/30 — multiples of the real-time target).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from colvo.config import ColvoConfig
    from colvo.runtime import init_state
    from colvo.runtime.infer import InferenceRunner

    cfg = ColvoConfig()  # production bf16, 256×320
    _, state = init_state(cfg, jax.random.key(0))
    runner = InferenceRunner(cfg, state.params)

    h, w = cfg.data.height, cfg.data.width
    batch = 8  # VO pairs in flight (streamed window batching)
    rng = np.random.default_rng(0)
    img_a = rng.random((batch, h, w, 3), dtype=np.float32)
    img_b = rng.random((batch, h, w, 3), dtype=np.float32)

    # warmup/compile
    out = runner.infer_coupled(img_a, img_b)
    # timed: steady-state coupled depth+pose (the config-5 VO hot path)
    iters = 30
    t0 = time.time()
    for _ in range(iters):
        out = runner._coupled_fn(runner.params, img_a, img_b)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    fps = batch / dt

    print(json.dumps({
        "metric": "coupled depth+pose inference (256x320, bf16, B=8)",
        "value": round(fps, 1),
        "unit": "fps/chip",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
