"""Basin-robustness lever study (VERDICT r4 next #4).

The flagship config reaches the strong basin on only ~2/3 of seeds
(docs/ABLATION.md: bimodal convergence, Abs-Rel 0.05-0.12 vs ~0.35).
This trains the flagship cell under each candidate lever at the
requested seeds:

  warmup:  train.warmup_steps=500   (linear LR warmup)
  georamp: loss.geo_ramp_steps=500  (geo-term weight 0→1)
  both:    warmup + georamp

Usage: python scripts/basin_levers.py [steps] [out_root] [seed ...]
Defaults: 4000 runs/levers 42 7 1234 — run a subset by listing seeds.
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

LEVERS = {
    "warmup": {"train.warmup_steps": 500},
    "georamp": {"loss.geo_ramp_steps": 500},
    "both": {"train.warmup_steps": 500, "loss.geo_ramp_steps": 500},
}


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_root = sys.argv[2] if len(sys.argv) > 2 else "runs/levers"
    seeds = [int(s) for s in sys.argv[3:]] or [42, 7, 1234]
    levers = os.environ.get("COLVO_LEVERS", "warmup,georamp").split(",")
    os.makedirs(out_root, exist_ok=True)

    for lever in levers:
        for seed in seeds:
            run_cell(dcdp=True, lcc=True, seed=seed, steps=steps,
                     out_root=out_root, name=f"dcdp1_lcc1_{lever}",
                     overrides=LEVERS[lever])
            aggregate(out_root, steps)


if __name__ == "__main__":
    main()
