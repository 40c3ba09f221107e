"""K1 microbench: fused loss kernel vs sampler+XLA composition, on chip.

Times the pieces of the photometric loss path at the production
batched_photo stack shape (n_scales*S*B = 96 frames, 256x320x3) so the
K1 decision (loss.fused_kernel default) is made from kernel-level data,
not whole-step deltas:

  * sampler_fwd / sampler_fwdbwd — Pallas bilinear sampler (the warp the
    default path uses), without / with the coordinate-gradient VJP.
  * xla_stats_fwdbwd — LCC+SSIM+L1 on a pre-warped stack (the XLA stats
    the fused kernel would absorb), grad to the warped frame.
  * composed_fwdbwd — sampler + XLA stats end to end, grad to coords
    (what loss.fused_kernel=false runs).
  * fused_fwd / fused_fwdbwd — the K1 Pallas kernel
    (colvo.kernels.fused_loss), grad to coords.

Serial-chain slope protocol (scripts/bench_train.py): N dependent
iterations, one fetch; slope between two N cancels dispatch overhead.

Usage: python scripts/bench_fused.py [n_frames]
Prints one JSON line per entry + a summary line.
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

import jax
import jax.numpy as jnp
import numpy as np


def chain_ms(fn, args, n1=5, n2=20):
    """Serial-chain slope time of y = fn(*args) in ms (y feeds arg 0).

    On this tunneled platform ``block_until_ready`` can return before
    execution finishes (README measurement note) — the only trusted sync
    is a real data fetch, so each chain ends with ``float(scalar)``; the
    fetch + dispatch overhead is constant and cancels in the slope."""
    y = fn(*args)
    jax.block_until_ready(y)  # compile + warm

    def chain(n):
        a = list(args)
        t0 = time.time()
        s = None
        for _ in range(n):
            out = fn(*a)
            # thread a scalar from the output back through arg 0 so the
            # chain is serially dependent (no overlap between iterations)
            s = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))
            a[0] = a[0] + 0.0 * s.astype(a[0].dtype)
        float(s)  # real fetch: pins the clock to executed work
        return time.time() - t0

    # Tunnel stalls only ever inflate a chain's wall time (README: ~2x
    # run-to-run variance), so min-per-length over repeats is the clean
    # estimate; the slope of the mins cancels dispatch/fetch overhead.
    chain(n1)  # warm the threading ops too
    t1 = min(chain(n1) for _ in range(3))
    t2 = min(chain(n2) for _ in range(3))
    return max((t2 - t1) / (n2 - n1), 0.0) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96  # 4 scales x 2 src x B=12
    h, w = 256, 320
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((n, h, w, 3), np.float32))
    tgt = jnp.asarray(rng.random((n, h, w, 3), np.float32))
    gx = jnp.asarray(rng.random((n, h, w), np.float32) * (w - 1))
    gy = jnp.asarray(rng.random((n, h, w), np.float32) * (h - 1))
    # VO-like warp: small displacement field around the identity grid
    jx, jy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    coords = jnp.stack(
        [jx[None] + 0.05 * (gx - jx[None]), jy[None] + 0.05 * (gy - jy[None])],
        axis=-1,
    )

    from colvo.kernels.sampler import bilinear_sample_pallas
    from colvo.kernels.fused_loss import warp_photometric_pallas
    from colvo.losses.photometric import lcc_calibrate, photometric_error

    out = {}

    f = jax.jit(lambda c, s: bilinear_sample_pallas(s, c))
    out["sampler_fwd"] = round(chain_ms(f, (coords, src)), 2)

    f = jax.jit(jax.grad(lambda c, s: jnp.sum(bilinear_sample_pallas(s, c))))
    out["sampler_fwdbwd"] = round(chain_ms(f, (coords, src)), 2)

    def stats(warped, t):
        cal = lcc_calibrate(warped, t, "affine", 15)
        return jnp.sum(photometric_error(cal, t, 0.85))

    f = jax.jit(jax.grad(stats))
    out["xla_stats_fwdbwd"] = round(chain_ms(f, (src, tgt)), 2)

    def composed(c, s, t):
        warped = bilinear_sample_pallas(s, c)
        cal = lcc_calibrate(warped, t, "affine", 15)
        return jnp.sum(photometric_error(cal, t, 0.85))

    f = jax.jit(jax.grad(composed))
    out["composed_fwdbwd"] = round(chain_ms(f, (coords, src, tgt)), 2)

    f = jax.jit(lambda c, s, t: warp_photometric_pallas(s, t, c, 15, 0.85))
    out["fused_fwd"] = round(chain_ms(f, (coords, src, tgt)), 2)

    f = jax.jit(jax.grad(
        lambda c, s, t: jnp.sum(warp_photometric_pallas(s, t, c, 15, 0.85))))
    out["fused_fwdbwd"] = round(chain_ms(f, (coords, src, tgt)), 2)

    print(json.dumps({"shape": [n, h, w, 3], "ms": out}))


if __name__ == "__main__":
    main()
