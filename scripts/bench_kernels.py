"""Per-kernel microbench: is each Pallas kernel at speed-of-light?

The round-4 profiler trace (scripts/profile_train.py) attributes 46 ms of
the 92 ms train step to `custom-call` — the Pallas sampler/scatter layer —
spread over ~50 launches with no single launch in the top-30 ops. This
times each kernel path IN ISOLATION at the exact training shapes
(B=12, 256x320, default Monodepth2 full-res photometric protocol +
native-scale geo pyramid) and reports ms/call and achieved GB/s against a
read-once/write-once byte model, so "structurally bandwidth-bound" and
"kernel overhead" stop being guesses.

Timing: serial-chain slope (the only trusted protocol on this platform —
see scripts/bench_train.py): a lax.scan whose carry perturbs the next
iteration's coords, timed at two chain lengths; the slope removes
dispatch/compile constants.

Usage: python scripts/bench_kernels.py [--n1 20] [--n2 80]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np


def main():
    argv = sys.argv[1:]
    flags = dict(a.lstrip("-").split("=", 1) for a in argv if "=" in a)
    n1 = int(flags.get("n1", "20"))
    n2 = int(flags.get("n2", "80"))
    only = flags.get("only", "")  # substring filter on case names

    import jax
    import jax.numpy as jnp

    from colvo.geometry.ops import bilinear_sample as xla_sample
    from colvo.kernels.sampler import bilinear_sample_pallas
    from colvo.kernels.scatter import bilinear_sample_fullgrad

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    b = 12

    def timed_chain(make_out, coords, iters):
        """Serial chain: each iteration's coords depend on the previous
        iteration's output, so nothing overlaps or dead-code-eliminates."""

        def body(c, _):
            out = make_out(coords + c)
            return jnp.sum(out).astype(coords.dtype) * 1e-30, None

        def run(n):
            f = jax.jit(
                lambda c0: jax.lax.scan(body, c0, None, length=n)[0]
            )
            r = f(jnp.zeros((), coords.dtype))  # compile + warm
            r.block_until_ready()
            t0 = time.time()
            r = f(jnp.zeros((), coords.dtype))
            r.block_until_ready()
            return time.time() - t0

        t_n1, t_n2 = run(n1), run(n2)
        return (t_n2 - t_n1) / (n2 - n1) * 1e3  # ms per call

    def case(name, img_shape, channels, fn, bytes_model):
        if only and only not in name:
            return None
        h, w = img_shape
        img = jnp.asarray(
            rng.random((b, h, w, channels), dtype=np.float32)
        )
        # plausible warp coords: identity + small flow, all in-bounds
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        base = np.stack([xx, yy], -1).astype(np.float32)[None]
        coords = jnp.asarray(
            np.clip(
                base + rng.normal(0, 2.0, (b, h, w, 2)).astype(np.float32),
                0,
                [w - 1, h - 1],
            )
        )
        ms = timed_chain(lambda c: fn(img, c), coords, n1)
        gb = bytes_model(b, h, w, channels) / 1e9
        return {
            "case": name,
            "shape": f"{b}x{h}x{w}x{channels}",
            "ms": round(ms, 3),
            "model_GB": round(gb, 4),
            "achieved_GBps": round(gb / (ms / 1e3), 1),
        }

    # read-once/write-once byte models (f32 = 4 B):
    #   fwd: read img + coords, write out
    fwd_bytes = lambda b_, h, w, c: 4 * b_ * h * w * (c + 2 + c)
    #   coords-grad bwd: read img + coords + cotangent, write dcoords
    cg_bytes = lambda b_, h, w, c: 4 * b_ * h * w * (c + 2 + c + 2)
    #   full-grad bwd: + write dimg
    fg_bytes = lambda b_, h, w, c: 4 * b_ * h * w * (c + 2 + c + 2 + c)

    def coords_grad(fn):
        def g(img, c):
            out, vjp = jax.vjp(lambda cc: fn(img, cc), c)
            return vjp(out)[0]

        return g

    def full_grad(fn):
        def g(img, c):
            out, vjp = jax.vjp(fn, img, c)
            di, dc = vjp(out)
            return jnp.sum(di) + jnp.sum(dc)

        return g

    results = []
    photo = (256, 320)
    geo_scales = [(256, 320), (128, 160), (64, 80), (32, 40)]

    sampler = bilinear_sample_pallas if on_tpu else xla_sample
    results.append(case("photo_fwd(sampler)", photo, 3, sampler, fwd_bytes))
    results.append(
        case("photo_bwd_coords(sampler)", photo, 3, coords_grad(sampler), cg_bytes)
    )
    results.append(case("photo_fwd(XLA)", photo, 3, xla_sample, fwd_bytes))
    results.append(
        case("photo_bwd_coords(XLA)", photo, 3, coords_grad(xla_sample), cg_bytes)
    )
    geo = bilinear_sample_fullgrad if on_tpu else xla_sample
    for h, w in geo_scales:
        results.append(case(f"geo_fwd@{h}", (h, w), 1, geo, fwd_bytes))
        results.append(
            case(f"geo_fwdbwd_full@{h}", (h, w), 1, full_grad(geo), fg_bytes)
        )
        results.append(
            case(f"geo_fwdbwd_full@{h}(XLA)", (h, w), 1,
                 full_grad(xla_sample), fg_bytes)
        )

    results = [r for r in results if r is not None]
    for r in results:
        print(json.dumps(r), flush=True)

    if only:
        return  # filtered run: no step reconstruction
    # Step-level reconstruction: default protocol = 8 full-res photometric
    # warp fwd+bwd(coords) + per-scale geo fullgrad fwd+bwd x 2 sources.
    by = {r["case"]: r["ms"] for r in results}
    photo_ms = 8 * by["photo_bwd_coords(sampler)"]
    geo_ms = 2 * sum(by[f"geo_fwdbwd_full@{h}"] for h, _ in geo_scales)
    print(
        json.dumps(
            {
                "est_step_kernel_ms": round(photo_ms + geo_ms, 2),
                "photo_8x_fwdbwd_ms": round(photo_ms, 2),
                "geo_2x_pyramid_fwdbwd_ms": round(geo_ms, 2),
                "note": "coords-grad bwd includes its fwd (vjp)",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
