"""DCDP / LCC ablation grid — the reference's two headline claims.

The reference (README.md:5-7) claims the DCDP coupling "ensures seamless
alignment of geometric projections" and LCC "accounts for brightness
variations". Both are config knobs here; this script measures them: the
2x2 grid (+/-model.dcdp_fusion, +/-loss.lcc) trained on the synthetic
colon corpus, each cell evaluated on the held-out sequence (depth
Abs-Rel, trajectory ATE, polyp localization error).

Colonoscopy-specific detail that makes LCC measurable: the synthetic
renderer models the headlight moving with the camera (data/synthetic.py
— inverse-square falloff from the camera origin), so adjacent frames
genuinely differ in brightness the way the reference describes.

Usage: python scripts/ablate.py [steps] [out_root]
Writes one JSON line per cell + a markdown table to <out_root>/ABLATION.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def run_cell(dcdp: bool, lcc: bool, steps: int, out_root: str,
             geo_cap: int = None, geo_w: float = None, name: str = None,
             exp_jitter: float = 0.0, seed: int = 42, lcc_mode: str = None,
             overrides: dict = None):
    import jax
    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, render_sequence
    from colvo.pipelines import evaluate_synthetic
    from colvo.runtime import export_params, train as train_loop

    name = name or f"dcdp{int(dcdp)}_lcc{int(lcc)}"
    # seed 42 keeps the round-2 cell names (resume compatibility); extra
    # seeds get suffixed dirs. Only the TRAINING seed varies (init +
    # shuffle); corpus and held-out eval sequence stay fixed so the
    # spread measures training stochasticity, not benchmark resampling.
    cell_dir = name if seed == 42 else f"{name}_s{seed}"
    out_dir = os.path.join(out_root, cell_dir)
    done_path = os.path.join(out_dir, "result.json")
    if os.path.exists(done_path):  # resume: skip completed cells
        with open(done_path) as f:
            rec = json.load(f)
        print(json.dumps(rec), flush=True)
        return rec
    cfg = ColvoConfig()
    cfg.train.seed = seed
    cfg.model.dcdp_fusion = dcdp
    cfg.loss.lcc = lcc
    if lcc_mode is not None:
        cfg.loss.lcc_mode = lcc_mode
    if geo_cap is not None:
        cfg.loss.geo_res_cap = geo_cap
    if geo_w is not None:
        cfg.loss.geometric_weight = geo_w
    for dotted, v in (overrides or {}).items():  # e.g. {"loss.photo_native": True}
        sect, attr = dotted.split(".")
        setattr(getattr(cfg, sect), attr, v)
    cfg.data.loader = "device"
    cfg.train.ckpt_dir = os.path.join(out_dir, "ckpt")
    cfg.train.log_every = 500
    cfg.train.ckpt_every_steps = steps

    weights = os.path.join(out_dir, "weights.npz")
    if os.path.exists(weights):
        train_s = -1  # resumed past training (killed mid-eval)
    else:
        seqs, ks = [], []
        for i in range(8):
            seq = render_sequence(n_frames=64, height=cfg.data.height,
                                  width=cfg.data.width, seed=100 + 7 * i,
                                  exposure_jitter=exp_jitter)
            seqs.append(seq.frames)
            ks.append(seq.k)
        ds = SnippetDataset(seqs, ks, cfg.data.frame_offsets)

        t0 = time.time()
        _, state = train_loop(cfg, ds, log_dir=os.path.join(out_dir, "train"),
                              max_steps=steps)
        train_s = time.time() - t0
        weights = export_params(jax.tree.map(np.asarray, state.params),
                                weights)
    metrics = evaluate_synthetic(cfg, weights=weights,
                                 out_dir=os.path.join(out_dir, "eval"),
                                 exposure_jitter=exp_jitter)
    rec = {"cell": name, "seed": seed, "dcdp": dcdp, "lcc": lcc,
           "steps": steps, "train_s": round(train_s),
           **{k: round(v, 4) for k, v in metrics.items()}}
    with open(done_path, "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec), flush=True)
    return rec


# A cell whose rotation drift exceeds this never converged to a usable
# VO solution — its other metrics describe a diverged model and must not
# be read as converged numbers (VERDICT r2 weak #3: the geow0 cell's
# 166.8 deg/frame sat unflagged next to converged rows).
DIVERGED_RPE_ROT_DEG = 30.0

SEEDS = (42, 7, 1234)  # >=3 seeds per statistical cell (VERDICT r2 next #3)


def aggregate(out_root: str, steps: int):
    """Re-aggregate every completed cell under ``out_root`` into
    ABLATION.md + ablation.jsonl. Called after EVERY cell so a partial
    sweep (killed mid-run, resumed later) always has a current table."""
    import glob

    recs = []
    for p in sorted(glob.glob(os.path.join(out_root, "*", "result.json"))):
        with open(p) as f:
            recs.append(json.load(f))
    if not recs:
        return
    keys = [k for k in recs[0] if k not in ("cell", "seed", "dcdp", "lcc",
                                            "steps", "train_s")]
    # aggregate across seeds: mean +/- std per cell, diverged seeds
    # flagged and EXCLUDED from the converged statistics (reported
    # separately — averaging a diverged run into a mean hides both).
    by_cell = {}
    for r in recs:
        by_cell.setdefault(r["cell"], []).append(r)
    lines = ["# DCDP / LCC ablation + geo-cap A/B (synthetic colon benchmark)",
             "",
             f"{len(by_cell)} cells x {steps} steps; statistical cells "
             f"run up to {len(SEEDS)} seeds {list(SEEDS)} (mean +/- std "
             "over CONVERGED seeds; a seed counts as diverged when "
             f"rpe_rot_deg > {DIVERGED_RPE_ROT_DEG}). Only the training "
             "seed varies — corpus and held-out eval sequence (seed 999) "
             "stay fixed. Lower is better for all error metrics.",
             "",
             "| cell | seeds (conv/total) | " + " | ".join(keys) + " |",
             "|---|---|" + "---|" * len(keys)]
    for cell, rs in by_cell.items():
        conv = [r for r in rs if r["rpe_rot_deg"] <= DIVERGED_RPE_ROT_DEG]
        use = conv or rs  # all-diverged cell: report it, flagged
        cols = []
        for k in keys:
            vals = np.array([r[k] for r in use], dtype=np.float64)
            if len(use) > 1:
                cols.append(f"{vals.mean():.4f}±{vals.std(ddof=1):.4f}")
            else:
                cols.append(f"{vals.mean():.4f}")
        flag = "" if conv == rs else " ⚠diverged" if not conv else " ⚠"
        lines.append(f"| {cell}{flag} | {len(conv)}/{len(rs)} | "
                     + " | ".join(cols) + " |")
    with open(os.path.join(out_root, "ABLATION.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(out_root, "ablation.jsonl"), "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_root = sys.argv[2] if len(sys.argv) > 2 else "runs/ablate"
    os.makedirs(out_root, exist_ok=True)

    # Cell list in PRIORITY order (headline cells and all their seeds
    # first): a partial sweep then yields multi-seed statistics for the
    # claims that matter most before spending chip time on the rest.
    #   - 2x2 DCDP/LCC grid (reference claims, README.md:5-7), trained
    #     under the production default (uncapped native-scale geo
    #     protocol — round 2's 4000-step A/B flipped the default);
    #   - LCC in its intended regime: per-frame auto-exposure gain
    #     (U(0.65, 1.35), train AND eval). The plain grid's headlight
    #     falloff is geometrically consistent between frames, so LCC has
    #     nothing to absorb there; these cells test the reference's
    #     actual claim ("accounts for brightness variations").
    #     The lccG arm trains the per-frame GLOBAL affine mode — the
    #     matched prior for auto-exposure (VERDICT r2 next #5);
    #   - single-seed protocol arms: geo-cap A/B (the uncapped arm IS
    #     dcdp1_lcc1) and DCDP's loss-level coupling ablated.
    def _headline(seed):
        return [
            dict(dcdp=True, lcc=True, seed=seed),
            dict(dcdp=True, lcc=True, seed=seed, exp_jitter=0.35,
                 name="expjit_dcdp1_lcc1"),
            dict(dcdp=True, lcc=False, seed=seed, exp_jitter=0.35,
                 name="expjit_dcdp1_lcc0"),
            dict(dcdp=True, lcc=True, seed=seed, exp_jitter=0.35,
                 lcc_mode="global+affine", name="expjit_dcdp1_lccG"),
        ]

    def _grid_rest(seed):
        return [
            dict(dcdp=False, lcc=True, seed=seed),  # the headline -DCDP row
            dict(dcdp=True, lcc=False, seed=seed),
            dict(dcdp=False, lcc=False, seed=seed),
        ]

    cells = (
        _headline(SEEDS[0]) + _grid_rest(SEEDS[0])  # full seed-42 table
        # photo_native quality A/B (one cell): the −7 ms byte-diet knob is
        # off by default pending this exact comparison vs dcdp1_lcc1
        # (VERDICT r3 weak #3). Early in the order so the perf work later
        # this round can act on the verdict.
        + [dict(dcdp=True, lcc=True, name="dcdp1_lcc1_pnative",
                overrides={"loss.photo_native": True})]
        + [c for s in SEEDS[1:] for c in _headline(s)]   # headline stats
        + [dict(dcdp=True, lcc=True, geo_cap=64, name="dcdp1_lcc1_geocap64"),
           # geo@128 (round 4): the per-kernel microbench puts the scale-0
           # geo full-grad warp at ~22 ms of the 92 ms step and a 128-cap
           # at ~6 ms (scripts/bench_kernels.py); 64 wrecked quality but
           # 128 was never tested — this cell is the quality half of that
           # perf decision.
           # 3 seeds: quality-neutral at one seed (abs_rel 0.0543 vs
           # 0.0559, −5.6 ms/step) is default-flip evidence only at n≥3.
           dict(dcdp=True, lcc=True, geo_cap=128, name="dcdp1_lcc1_geocap128"),
           dict(dcdp=True, lcc=True, geo_cap=128, seed=7,
                name="dcdp1_lcc1_geocap128"),
           dict(dcdp=True, lcc=True, geo_cap=128, seed=1234,
                name="dcdp1_lcc1_geocap128"),
           dict(dcdp=True, lcc=True, geo_w=0.0, name="dcdp1_lcc1_geow0")]
        + [c for s in SEEDS[1:] for c in _grid_rest(s)]  # grid stats
    )
    for cell in cells:
        run_cell(steps=steps, out_root=out_root, **cell)
        aggregate(out_root, steps)
    print(f"wrote {out_root}/ABLATION.md")


if __name__ == "__main__":
    main()
