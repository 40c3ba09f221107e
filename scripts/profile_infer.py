"""Profile inference path components on the real chip (dev tool).

Separates: tunnel dispatch overhead, H2D transfer, depth-only, pose-only,
coupled graph — to locate where the fps goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

from colvo.config import ColvoConfig
from colvo.runtime import init_state
from colvo.runtime.infer import InferenceRunner


def timeit(label, fn, iters=30):
    fn()  # warm
    jax.effects_barrier()
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label:40s} {dt*1e3:8.2f} ms/call")
    return dt


def main():
    print("devices:", jax.devices())
    cfg = ColvoConfig()
    _, state = init_state(cfg, jax.random.key(0))
    runner = InferenceRunner(cfg, state.params)
    h, w = cfg.data.height, cfg.data.width
    B = 8
    rng = np.random.default_rng(0)
    a_np = rng.random((B, h, w, 3), dtype=np.float32)
    b_np = rng.random((B, h, w, 3), dtype=np.float32)
    a = jax.device_put(a_np)
    b = jax.device_put(b_np)
    p = runner.params

    trivial = jax.jit(lambda x: x + 1.0)
    xs = jax.device_put(np.zeros((8, 128), np.float32))
    timeit("trivial jit dispatch", lambda: trivial(xs))
    timeit("H2D transfer (2 frames batch)", lambda: jax.device_put((a_np, b_np)))
    timeit("depth only (device-resident)", lambda: runner._depth_fn(p, a))
    timeit("pose only (device-resident)", lambda: runner._pose_fn(p, a, b))
    dt = timeit("coupled (device-resident)", lambda: runner._coupled_fn(p, a, b))
    print(f"coupled fps/chip (device-resident): {B/dt:.1f}")
    dt2 = timeit("coupled (numpy inputs)", lambda: runner._coupled_fn(p, a_np, b_np))
    print(f"coupled fps/chip (numpy inputs):    {B/dt2:.1f}")


if __name__ == "__main__":
    main()
