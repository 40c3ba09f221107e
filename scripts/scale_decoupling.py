"""Prove (or refute) the depth<->pose scale-decoupling diagnosis.

Three of the 24 round-4 ablation seed-runs post good rotation but 30-50x
polyp-localization error (docs/ABLATION.md section 6). The hypothesis:
their depth scale drifted away from their translation scale — invisible
to median-scaled depth metrics and to sim(3)-aligned ATE, but fatal to
polyp localization (depth lifted through the trajectory-scaled pose,
colvo/pipelines.py:305-335).

For each run this measures the two scales INDEPENDENTLY on the held-out
sequence (seed 999, the ablation eval protocol — jittered arm for
expjit-trained cells):

  s_traj  = Umeyama sim(3) scale aligning predicted->GT camera positions
  s_depth = median over frames of median(gt_depth) / median(pred_depth)

A scale-consistent monocular model has s_traj ~= s_depth (one shared
gauge); the decoupling ratio s_traj / s_depth should sit near 1. The
hypothesis predicts ratios far from 1 exactly for the high-polyp-e runs
and near 1 for their well-behaved sibling seeds.

Usage: python scripts/scale_decoupling.py [ablate_root] [out_md]
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

# (run dir, expjit eval arm, config overrides) — decoupled runs + the
# well-behaved sibling seeds as controls.
RUNS = [
    ("expjit_dcdp1_lccG", True, ["--loss.lcc_mode=global+affine"]),
    ("expjit_dcdp1_lccG_s1234", True, ["--loss.lcc_mode=global+affine"]),
    ("expjit_dcdp1_lccG_s7", True, ["--loss.lcc_mode=global+affine"]),
    ("dcdp0_lcc0", False, ["--model.dcdp_fusion=false", "--loss.lcc=false"]),
    ("dcdp0_lcc0_s1234", False,
     ["--model.dcdp_fusion=false", "--loss.lcc=false"]),
    ("dcdp1_lcc1", False, []),
]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "runs/ablate"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_DECOUPLING.md"

    from colvo.config import ColvoConfig
    from colvo.data.synthetic import render_sequence
    from colvo.pipelines import make_runner
    from colvo.vo import umeyama
    from colvo.vo.driver import run_vo

    cfg0 = ColvoConfig()
    seqs = {
        False: render_sequence(48, cfg0.data.height, cfg0.data.width,
                               seed=999),
        True: render_sequence(48, cfg0.data.height, cfg0.data.width,
                              seed=999, exposure_jitter=0.35),
    }

    rows = []
    for run, jit_arm, overrides in RUNS:
        weights = os.path.join(root, run, "weights.npz")
        res_path = os.path.join(root, run, "result.json")
        if not os.path.exists(weights):
            print(f"skip {run}: {weights} missing", flush=True)
            continue
        cfg = ColvoConfig()
        if overrides:
            cfg.apply_overrides(overrides)
        runner = make_runner(cfg, weights)
        seq = seqs[jit_arm]
        vo = run_vo(runner, list(seq.frames), keyframe_every=1)
        _, _, s_traj = umeyama(
            vo.poses[:, :3, 3], seq.poses[:, :3, 3].astype(np.float64)
        )
        s_depth = float(
            np.median(
                [
                    np.median(seq.depths[i]) / max(np.median(d), 1e-9)
                    for i, d in enumerate(vo.depths)
                ]
            )
        )
        polyp_e = float("nan")
        if os.path.exists(res_path):
            polyp_e = json.load(open(res_path)).get("polyp/e_mean",
                                                    float("nan"))
        row = {
            "run": run,
            "eval_arm": "expjit" if jit_arm else "clean",
            "s_traj": round(float(s_traj), 4),
            "s_depth": round(s_depth, 4),
            "decoupling": round(float(s_traj) / s_depth, 3),
            "polyp_e_mean": round(polyp_e, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if not rows:
        print("no runs available")
        return

    lines = [
        "# Depth<->pose scale decoupling — measured",
        "",
        "`s_traj` (Umeyama sim(3) trajectory scale) vs `s_depth` (median "
        "GT/pred depth ratio) on the held-out sequence; a scale-consistent "
        "model shares one gauge so `s_traj / s_depth ~= 1`. The ablation's "
        "polyp-e blowups (docs/ABLATION.md section 6) should — and the "
        "well-behaved sibling seeds should NOT — show ratios far from 1.",
        "",
        "| run | eval arm | s_traj | s_depth | s_traj/s_depth | polyp e_mean |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['run']} | {r['eval_arm']} | {r['s_traj']} | "
            f"{r['s_depth']} | **{r['decoupling']}** | {r['polyp_e_mean']} |"
        )
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
