"""Validate the depth<->pose gauge-coupling prior by re-training.

Round 4 measured translation-gauge collapse (~100-200x, polyp-e 5-10) on
3 of 24 ablation seed-runs: expjit_dcdp1_lccG seeds 7+1234 and dcdp0_lcc0
seed 1234 (docs/SCALE_DECOUPLING.md). With loss.gauge_* now defaulting ON
(config.py), this re-trains exactly those cells at all three protocol
seeds, plus the flagship dcdp1_lcc1 (which must not regress), into
runs/gauge — same 4000-step protocol, same held-out eval as the ablation
grid (scripts/ablate.py).

Pass/fail (VERDICT r4 next #2): 0/6 collapses on the two historically-
collapsing cells (polyp e_mean <= 0.3 per seed), flagship metrics within
the round-4 distribution.

Usage: python scripts/gauge_validate.py [steps] [out_root]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

from ablate import SEEDS, aggregate, run_cell  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_root = sys.argv[2] if len(sys.argv) > 2 else "runs/gauge"
    os.makedirs(out_root, exist_ok=True)

    cells = []
    # Flagship first: its weights feed the full-colon rerun
    # (scripts/fullcolon.py), so a partial queue unblocks that artifact
    # at the earliest possible point.
    for seed in SEEDS:
        cells.append(dict(dcdp=True, lcc=True, seed=seed))
    for seed in SEEDS:
        cells.append(dict(dcdp=True, lcc=True, seed=seed, exp_jitter=0.35,
                          lcc_mode="global+affine", name="expjit_dcdp1_lccG"))
    for seed in SEEDS:
        cells.append(dict(dcdp=False, lcc=False, seed=seed))
    # H3 fix cell (docs/EXPJIT_MECHANISM.md): calibrate the automask's
    # identity reference under the same global LCC the warp gets.
    for seed in SEEDS:
        cells.append(dict(dcdp=True, lcc=True, seed=seed, exp_jitter=0.35,
                          lcc_mode="global+affine",
                          name="expjit_dcdp1_lccG_ident",
                          overrides={"loss.lcc_identity": True}))
    # photo_native quality cell at n=3 (VERDICT r4 next #9: the round-4
    # "-7 ms costs +13.5% Abs-Rel, ~5σ" claim rested on ONE seed of a
    # bimodal benchmark; these two more seeds settle it).
    for seed in SEEDS:  # all three: the baseline cell re-trains under the
        # same (gauge-on) defaults, so the A/B stays apples-to-apples
        cells.append(dict(dcdp=True, lcc=True, seed=seed,
                          name="dcdp1_lcc1_pnative",
                          overrides={"loss.photo_native": True}))

    for c in cells:
        run_cell(steps=steps, out_root=out_root, **c)
        aggregate(out_root, steps)


if __name__ == "__main__":
    main()
