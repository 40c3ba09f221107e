"""Train-step time decomposition on the real chip (serial-chain protocol).

Times the full step and a set of ablated variants (geo off, LCC off,
SSIM off, photometric-only model grad) to attribute the step budget to
loss components — guides kernel-fusion work (VERDICT round 1 weak #2).

Usage: python scripts/bench_decompose.py
Prints one JSON line per variant.

Measured (TPU v5 lite, fresh process, ms/step, multi-channel sampler):
full 90.9, geo_off 81.2, lcc_off 85.1, geo_lcc_off 72.9, photo_only
68.9, geo_capped64 86.4, geo_full_res 92.3, ssim_off 63.3, fused_kernel
204.8 (see kernels/fused_loss.py). Historical note: with the old
plane-per-channel sampler, ssim_off measured 265.8 — an XLA fusion
regression (identical FLOPs, 164.8 vs 59.8 GB accessed) triggered by
the coords-repeat/reshape chain around the gather; the multi-channel
sampler layout removed it.

``--bytes`` prints compiled-program FLOPs + bytes per variant instead of
timing. Measured: full 1529.8 GFLOP / 59.6 GB per step → at 90.9 ms the
step moves ~656 GB/s ≈ 80% of v5e HBM peak — bandwidth-bound (README
roofline row); base model+photometric carries 44.1 GB, LCC stats +8.5,
SSIM +4.9, geo-consistency +2.1.
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


def time_step(cfg_overrides, batch_src=None, n1=10, n2=40):
    import jax
    import jax.numpy as jnp

    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, batch_iterator, render_sequence
    from colvo.runtime import init_state, make_optimizer, make_train_step

    cfg = ColvoConfig()
    if cfg_overrides:
        cfg.apply_overrides(cfg_overrides)

    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    seq = render_sequence(
        n_frames=16, height=cfg.data.height, width=cfg.data.width, seed=0
    )
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = jax.tree.map(jnp.asarray, next(batch_iterator(ds, cfg.data, seed=0)))

    state, m = step_fn(state, batch)
    float(m["loss/total"])  # compile + warm

    def chain(n):
        nonlocal state
        t0 = time.time()
        last = None
        for _ in range(n):
            state, m = step_fn(state, batch)
            last = m["loss/total"]
        float(last)
        return time.time() - t0

    best = float("inf")
    for _ in range(2):
        t1, t2 = chain(n1), chain(n2)
        best = min(best, (t2 - t1) / (n2 - n1))
    return best * 1e3


def cost_of(cfg_overrides):
    """Compiled-program FLOPs + bytes accessed (XLA cost analysis) for one
    variant — attributes the step's memory traffic (the step is
    bandwidth-bound; see module docstring) without timing noise."""
    import jax
    import jax.numpy as jnp

    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, batch_iterator, render_sequence
    from colvo.runtime import init_state, make_optimizer, make_train_step

    cfg = ColvoConfig()
    if cfg_overrides:
        cfg.apply_overrides(cfg_overrides)
    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    seq = render_sequence(
        n_frames=16, height=cfg.data.height, width=cfg.data.width, seed=0
    )
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = jax.tree.map(jnp.asarray, next(batch_iterator(ds, cfg.data, seed=0)))
    ca = step_fn.lower(state, batch).compile().cost_analysis()
    c = ca[0] if isinstance(ca, (list, tuple)) else ca
    return {"flops_G": round(float(c.get("flops", 0)) / 1e9, 1),
            "bytes_GB": round(float(c.get("bytes accessed", 0)) / 1e9, 2)}


def main():
    do_cost = "--bytes" in sys.argv
    variants = {
        "full": [],
        "geo_off": ["--loss.geometric_weight=0"],
        "lcc_off": ["--loss.lcc=false"],
        "ssim_off": ["--loss.ssim_alpha=0"],  # L1-only photometric
        "geo_lcc_off": ["--loss.geometric_weight=0", "--loss.lcc=false"],
        "photo_only": ["--loss.geometric_weight=0", "--loss.lcc=false",
                       "--loss.smoothness_weight=0", "--loss.automask=false"],
        "geo_capped64": ["--loss.geo_res_cap=64"],  # round-1 default (A/B arm)
        "geo_full_res": ["--loss.geo_full_res=true"],
        "fused_kernel": ["--loss.fused_kernel=true"],  # K1 Pallas loss kernel
    }
    out = {}
    for name, ov in variants.items():
        try:
            if do_cost:
                rec = cost_of(ov)
            else:
                rec = round(time_step(ov), 1)
        except Exception as e:  # keep going; report the failure
            rec = f"ERROR: {type(e).__name__}: {e}"
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({("summary_cost" if do_cost else "summary_ms"): out}))


if __name__ == "__main__":
    main()
