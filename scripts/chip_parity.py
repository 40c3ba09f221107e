"""Compiled-on-chip parity check for the Pallas kernels vs XLA.

The interpret-mode tests (tests/test_kernels.py) pin the math; this runs
the same contracts COMPILED on the real TPU — the toolchain can miscompile
what interpret mode executes fine (negative dynamic rolls, see
colvo.kernels.scatter docstring), so every kernel-structure change gets
this gate before any training/bench uses it.

Usage: python scripts/chip_parity.py   (exit 0 = all parity gates pass)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from colvo.geometry import bilinear_sample
    from colvo.kernels.sampler import (
        SWEEP_MODE,
        bilinear_sample_pallas,
        bilinear_sample_pallas_grouped,
    )
    from colvo.kernels.scatter import bilinear_sample_fullgrad

    assert jax.default_backend() == "tpu", jax.default_backend()
    print(f"sweep mode: {SWEEP_MODE}", flush=True)
    rng = np.random.default_rng(0)

    def coords_like(b, h, w, scale, seed):
        r = np.random.default_rng(seed)
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        return jnp.asarray(np.stack([
            gx[None] + r.normal(0, scale, (b, h, w)).astype(np.float32),
            gy[None] + r.normal(0, scale, (b, h, w)).astype(np.float32),
        ], axis=-1) + 0.3)

    fails = 0

    def check(name, a, b_, atol):
        nonlocal fails
        d = float(jnp.max(jnp.abs(a - b_)))
        ok = d <= atol
        fails += 0 if ok else 1
        print(f"{'OK ' if ok else 'FAIL'} {name}: max|Δ|={d:.2e}", flush=True)

    # production photo shape + a VO warp, mild and wild
    for scale, tag in ((2.0, "mild"), (12.0, "wild")):
        img = jnp.asarray(rng.random((4, 256, 320, 3), dtype=np.float32))
        crd = coords_like(4, 256, 320, scale, int(scale))
        ref = bilinear_sample(img, crd)
        out = jax.jit(bilinear_sample_pallas)(img, crd)
        check(f"sampler_mc fwd {tag}", out, ref, 1e-5)

        g_ref = jax.grad(lambda c: jnp.sum(jnp.cos(bilinear_sample(img, c))))(crd)
        g_out = jax.grad(
            lambda c: jnp.sum(jnp.cos(bilinear_sample_pallas(img, c))))(crd)
        check(f"sampler_mc coord-grad {tag}", g_out, g_ref, 2e-4)

    # grouped launch (batched_photo infrastructure)
    img = jnp.asarray(rng.random((2, 256, 320, 3), dtype=np.float32))
    crd = coords_like(8, 256, 320, 2.0, 5)
    ref = bilinear_sample(jnp.repeat(img, 4, axis=0), crd)
    out = jax.jit(lambda i, c: bilinear_sample_pallas_grouped(i, c, 4))(img, crd)
    check("sampler grouped fwd", out, ref, 1e-5)

    # full-grad plane sampler (geo path): fwd + BOTH grads
    img1 = jnp.asarray(rng.random((4, 256, 320, 1), dtype=np.float32))
    crd1 = coords_like(4, 256, 320, 2.0, 9)
    ref = bilinear_sample(img1, crd1)
    out = jax.jit(bilinear_sample_fullgrad)(img1, crd1)
    check("fullgrad fwd", out, ref, 1e-5)
    for arg in (0, 1):
        g_ref = jax.grad(
            lambda *a: jnp.sum(jnp.cos(3 * bilinear_sample(*a))), arg
        )(img1, crd1)
        g_out = jax.grad(
            lambda *a: jnp.sum(jnp.cos(3 * bilinear_sample_fullgrad(*a))), arg
        )(img1, crd1)
        check(f"fullgrad grad arg{arg}", g_out, g_ref, 2e-4)

    # fused K1 (GATHER_ROWS=8 + class sweep inside)
    from colvo.kernels.fused_loss import warp_photometric_pallas
    from colvo.losses.photometric import lcc_calibrate, photometric_error

    src = jnp.asarray(rng.random((2, 256, 320, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((2, 256, 320, 3), dtype=np.float32))
    crd = coords_like(2, 256, 320, 2.0, 13)
    ref = photometric_error(
        lcc_calibrate(bilinear_sample(src, crd), tgt, "affine", 15), tgt, 0.85)
    out = jax.jit(
        lambda s, t, c: warp_photometric_pallas(s, t, c, 15, 0.85)
    )(src, tgt, crd)
    check("fused K1 fwd", out, ref, 5e-5)

    print("PARITY", "PASS" if fails == 0 else f"FAIL({fails})", flush=True)
    sys.exit(0 if fails == 0 else 1)


if __name__ == "__main__":
    main()
