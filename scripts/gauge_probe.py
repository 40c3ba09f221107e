"""Measure the in-loss gauge ratio r = mean||t|| / median(pred depth).

The scale-decoupling diagnosis (docs/SCALE_DECOUPLING.md) measured
s_traj / s_depth against GT; the FIX needs a self-contained quantity the
training loss can see. This probes r on existing trained runs — healthy
and collapsed — so the gauge-range prior's bounds (loss.gauge_lo/hi) are
set from measurement, not guesswork: healthy runs should cluster within
a band; the three collapsed runs should sit ~100x below it.

Usage: COLVO_PLATFORM=cpu python scripts/gauge_probe.py [ablate_root]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np

RUNS = [
    # (run dir, expjit eval arm, model overrides) — collapsed + healthy
    ("expjit_dcdp1_lccG", True, []),
    ("expjit_dcdp1_lccG_s1234", True, []),   # collapsed (196x)
    ("expjit_dcdp1_lccG_s7", True, []),      # collapsed (110x)
    ("dcdp0_lcc0", False, ["--model.dcdp_fusion=false"]),
    ("dcdp0_lcc0_s1234", False, ["--model.dcdp_fusion=false"]),  # collapsed
    ("dcdp1_lcc1", False, []),
    ("dcdp1_lcc1_s7", False, []),
    ("expjit_dcdp1_lcc1", True, []),
]


def main():
    if os.environ.get("COLVO_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    root = sys.argv[1] if len(sys.argv) > 1 else "runs/ablate"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from colvo.config import ColvoConfig
    from colvo.data.synthetic import render_sequence
    from colvo.pipelines import make_runner

    cfg0 = ColvoConfig()
    seqs = {
        False: render_sequence(n_frames, cfg0.data.height, cfg0.data.width,
                               seed=999),
        True: render_sequence(n_frames, cfg0.data.height, cfg0.data.width,
                              seed=999, exposure_jitter=0.35),
    }

    runs = RUNS
    if os.path.normpath(root) != os.path.normpath("runs/ablate"):
        # Generic roots (runs/gauge2, runs/levers, ...): glob trained
        # cells; the eval arm and model arch are recoverable from the
        # cell-naming convention (scripts/ablate.py::run_cell).
        import glob

        runs = []
        for w in sorted(glob.glob(os.path.join(root, "*", "weights.npz"))):
            name = os.path.basename(os.path.dirname(w))
            runs.append((name, name.startswith("expjit_"),
                         ["--model.dcdp_fusion=false"]
                         if "dcdp0" in name else []))

    for run, jit_arm, overrides in runs:
        weights = os.path.join(root, run, "weights.npz")
        if not os.path.exists(weights):
            print(json.dumps({"run": run, "skip": "missing"}), flush=True)
            continue
        cfg = ColvoConfig()  # pose/depth forward does not depend on loss cfg
        if overrides:
            cfg.apply_overrides(overrides)
        runner = make_runner(cfg, weights)
        frames = np.asarray(seqs[jit_arm].frames, np.float32)
        a, b_ = frames[:-1], frames[1:]
        depth, _ = runner.infer_depth(frames)
        pose6 = runner.infer_pose(a, b_)
        t_norm = float(np.mean(np.linalg.norm(pose6[:, 3:], axis=-1)))
        d_med = float(np.median(depth))
        d_mean = float(np.mean(depth))  # the loss term uses the MEAN
        print(json.dumps({
            "run": run,
            "mean_t": round(t_norm, 6),
            "median_depth": round(d_med, 5),
            "mean_depth": round(d_mean, 5),
            "r_median": round(t_norm / d_med, 6),
            "r": round(t_norm / d_mean, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
