"""On-chip sampler microbenchmarks: tile_h sweep, fwd-only trim, parity.

Serial-chain slope protocol (scripts/bench_train.py docstring). Run after
kernel changes to re-pick DEFAULT_TILE_H and validate the fwd-only path.
Usage: python scripts/bench_sampler.py
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

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from colvo.geometry.ops import bilinear_sample as xla_sample
    from colvo.kernels.sampler import bilinear_sample_pallas

    B, H, W, C = 12, 256, 320, 3
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    coords = np.stack([gx, gy], -1)[None] + rng.normal(
        0, 4, (B, H, W, 2)
    ).astype(np.float32)
    coords = jnp.asarray(coords)
    cot = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))

    ref = np.asarray(jax.jit(lambda c: xla_sample(src, c))(coords))

    def chain_time(jf, n1=5, n2=25):
        c, r = jf(coords)
        jax.block_until_ready(r)

        def chain(n):
            cc = coords
            t0 = time.time()
            for _ in range(n):
                cc, rr = jf(cc)
            jax.block_until_ready(rr)
            return time.time() - t0

        best = float("inf")
        for _ in range(2):
            t1, t2 = chain(n1), chain(n2)
            best = min(best, (t2 - t1) / (n2 - n1))
        return best * 1e3

    out = {}
    for th in (32, 64, 128):
        def fwd(c, th=th):
            r = bilinear_sample_pallas(src, c, th)
            return c + 0.0 * r.sum(-1)[..., None], r

        f = jax.jit(fwd)
        got = np.asarray(f(coords)[1])
        err = float(np.abs(got - ref).max())
        out[f"fwd_tile{th}_ms"] = round(chain_time(f), 2)
        out[f"fwd_tile{th}_err"] = err

        gfn = jax.grad(
            lambda c, th=th: (bilinear_sample_pallas(src, c, th) * cot).sum()
        )

        def bwd(c, gfn=gfn):
            g = gfn(c)
            return c + 0.0 * g, g

        out[f"grad_tile{th}_ms"] = round(chain_time(jax.jit(bwd)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
