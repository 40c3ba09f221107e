"""Benchmark: end-to-end streaming VO (coupled depth+pose) on one TPU chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "fps/chip", "vs_baseline": N}``

Measures the config-5 hot path exactly as the framework runs it in
production: decoder-native planar I420 frames stream from host in chunks
(H.26x/VP9 decoders emit YUV 4:2:0 — half the bytes of RGB), are
converted + normalized on device, every frame gets a dense depth map and
every consecutive pair a DCDP-fused 6-DoF pose (colvo/vo/stream.py), and
relative poses are chained into the global trajectory on host. The north-star target is >30 coupled
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
    n = 32 * chunk + 1
    frames_rgb = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    # Input is planar I420 (YUV 4:2:0) — the byte-exact format H.26x/VP9
    # decoders emit; the BT.601 conversion runs on device
    # (colvo/vo/stream.py). The host-side pack below stands in for the
    # decoder and is outside the timed region.
    from colvo.vo.stream import rgb_to_i420

    frames = rgb_to_i420(frames_rgb)

    # warmup/compile (init fn + chunk fn; memoized on the runner)
    run_vo(runner, frames[: chunk + 1], chunk_size=chunk, input_format="i420")

    # best-of-4 damps the host↔device link's stochastic stalls
    fps = 0.0
    for _ in range(4):
        t0 = time.time()
        vo = run_vo(runner, frames, chunk_size=chunk, input_format="i420")
        dt = time.time() - t0
        assert vo.poses.shape[0] == n
        fps = max(fps, n / dt)

    print(json.dumps({
        "metric": "streaming VO: depth map + DCDP pose per frame, "
                  "decoder-native I420 in, f16 depth out (256x320, bf16)",
        "value": round(fps, 1),
        "unit": "fps/chip",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
