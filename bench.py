"""Benchmark: end-to-end streaming VO (coupled depth+pose) on one TPU chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "fps/chip", "vs_baseline": N}``

Measures the config-5 hot path exactly as the framework runs it in
production: uint8 frames stream from host in chunks, are normalized on
device, every frame gets a dense depth map and every consecutive pair a
DCDP-fused 6-DoF pose (colvo/vo/stream.py), and relative poses are chained
into the global trajectory on host. The north-star target is >30 coupled
depth+pose fps/chip (BASELINE.json; the reference publishes no speed
numbers, so ``vs_baseline`` is value/30 — multiples of the real-time
target).
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

    from colvo.config import ColvoConfig
    from colvo.runtime import init_state
    from colvo.runtime.infer import InferenceRunner
    from colvo.vo import run_vo

    cfg = ColvoConfig()  # production bf16, 256×320
    _, state = init_state(cfg, jax.random.key(0))
    runner = InferenceRunner(cfg, state.params)

    h, w = cfg.data.height, cfg.data.width
    chunk = 32
    rng = np.random.default_rng(0)
    # long enough that pipeline startup/drain amortizes (steady state)
    frames = rng.integers(0, 256, (32 * chunk + 1, h, w, 3), dtype=np.uint8)

    # warmup/compile (init fn + chunk fn; memoized on the runner)
    run_vo(runner, frames[: chunk + 1], chunk_size=chunk)

    # best-of-3 damps the host↔device link's stochastic stalls
    fps = 0.0
    for _ in range(3):
        t0 = time.time()
        vo = run_vo(runner, frames, chunk_size=chunk)
        dt = time.time() - t0
        assert vo.poses.shape[0] == len(frames)
        fps = max(fps, len(frames) / dt)

    print(json.dumps({
        "metric": "streaming VO: depth map + DCDP pose per frame, uint8 in (256x320, bf16)",
        "value": round(fps, 1),
        "unit": "fps/chip",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
