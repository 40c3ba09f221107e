"""Re-run the runs/gauge2 production-band validation queue, collapsers first.

The original gauge2 queue (scripts/gauge_validate.py, flagship-first order)
completed far enough on the previous VM to produce the full-colon artifact,
but the VM was recycled before the validation table was transcribed into
docs/GAUGE.md. This requeue re-runs the same cells under the same defaults
(loss.gauge_* ON at the production band [0.03, 0.3]) in *evidence-priority*
order: the three historically-collapsing seed-cells first — they alone
decide VERDICT r4 next #2's pass/fail (polyp e_mean <= 0.3, no gauge
collapse) — then the remaining seeds, the flagship non-regress cells, the
restart-protocol proof, and finally the lcc_identity / photo_native A/Bs.

Usage: python scripts/gauge2_requeue.py [steps] [out_root]
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

from ablate import aggregate, run_cell  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_root = sys.argv[2] if len(sys.argv) > 2 else "runs/gauge2"
    os.makedirs(out_root, exist_ok=True)

    expjit = dict(dcdp=True, lcc=True, exp_jitter=0.35,
                  lcc_mode="global+affine", name="expjit_dcdp1_lccG")
    cells = [
        # --- the three round-4 collapser seed-cells: the pass/fail core ---
        dict(seed=7, **expjit),
        dict(seed=1234, **expjit),
        dict(dcdp=False, lcc=False, seed=1234),
        # --- remaining seeds of the two historically-collapsing cells ---
        dict(seed=42, **expjit),
        dict(dcdp=False, lcc=False, seed=42),
        dict(dcdp=False, lcc=False, seed=7),
        # --- flagship non-regress under the gauge prior ---
        dict(dcdp=True, lcc=True, seed=42),
        dict(dcdp=True, lcc=True, seed=7),
        dict(dcdp=True, lcc=True, seed=1234),
        # --- restart-protocol proof at the historically-bad seed ---
        dict(dcdp=True, lcc=True, seed=1234, name="dcdp1_lcc1_restart",
             overrides={"train.restart_threshold": 0.015,
                        "train.restart_check_step": 1500,
                        "train.restart_max": 2}),
        # --- H3 fix cell: automask identity calibrated under global LCC ---
        dict(seed=42, **dict(expjit, name="expjit_dcdp1_lccG_ident"),
             overrides={"loss.lcc_identity": True}),
        dict(seed=7, **dict(expjit, name="expjit_dcdp1_lccG_ident"),
             overrides={"loss.lcc_identity": True}),
        dict(seed=1234, **dict(expjit, name="expjit_dcdp1_lccG_ident"),
             overrides={"loss.lcc_identity": True}),
        # --- photo_native quality at n=3 (VERDICT r4 next #9) ---
        dict(dcdp=True, lcc=True, seed=42, name="dcdp1_lcc1_pnative",
             overrides={"loss.photo_native": True}),
        dict(dcdp=True, lcc=True, seed=7, name="dcdp1_lcc1_pnative",
             overrides={"loss.photo_native": True}),
        dict(dcdp=True, lcc=True, seed=1234, name="dcdp1_lcc1_pnative",
             overrides={"loss.photo_native": True}),
    ]

    for c in cells:
        run_cell(steps=steps, out_root=out_root, **c)
        aggregate(out_root, steps)


if __name__ == "__main__":
    main()
