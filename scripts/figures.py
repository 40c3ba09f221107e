"""Multi-method reference-style figures from trained ablation variants.

The reference's eval artifacts compare many methods per figure
(imgs/qualitativeresults.png rows a-h; imgs/trajectorypredictions.png
legend). `viz_depth_grid`/`viz_trajectory` take method dicts for exactly
this, but round 2 only ever rendered single-method figures (VERDICT r2
next #8). This drives them as designed: the ablation variants (full /
-DCDP / -LCC) as the method rows, on the shared held-out sequence — the
reference's figure shape with our own ablation as the method family.

Usage: python scripts/figures.py [ablate_root] [out_dir]
Needs runs/ablate/<cell>/weights.npz from scripts/ablate.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np

# method label -> (cell dir, config overrides matching how it was trained).
# Whatever cells exist in the ablation root become figure rows — the
# reference's multi-method grid shape with our ablation as the family.
METHODS = {
    "ColVO(ours)": ("dcdp1_lcc1", []),
    "-DCDP": ("dcdp0_lcc1", ["--model.dcdp_fusion=false"]),
    "-LCC": ("dcdp1_lcc0", ["--loss.lcc=false"]),
    "geo capped@64": ("dcdp1_lcc1_geocap64", ["--loss.geo_res_cap=64"]),
    "expjit-trained": ("expjit_dcdp1_lcc1", []),
    "expjit-trained -LCC": ("expjit_dcdp1_lcc0", ["--loss.lcc=false"]),
    "expjit-trained LCC-global": ("expjit_dcdp1_lccG",
                                  ["--loss.lcc_mode=global+affine"]),
}


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "runs/ablate"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "docs/figures"
    os.makedirs(out_dir, exist_ok=True)

    from colvo.config import ColvoConfig
    from colvo.data.synthetic import render_sequence
    from colvo.evaluation.viz import viz_depth_grid, viz_trajectory
    from colvo.pipelines import make_runner
    from colvo.vo import align_trajectory
    from colvo.vo.driver import chain_relative_poses

    cfg0 = ColvoConfig()
    seq = render_sequence(n_frames=48, height=cfg0.data.height,
                          width=cfg0.data.width, seed=999)

    preds, trajs = {}, {"Ground Truth": seq.poses[:, :3, 3].astype(np.float64)}
    for label, (cell, overrides) in METHODS.items():
        weights = os.path.join(root, cell, "weights.npz")
        if not os.path.exists(weights):
            print(f"skip {label}: {weights} missing", flush=True)
            continue
        cfg = ColvoConfig()
        if overrides:
            cfg.apply_overrides(overrides)
        runner = make_runner(cfg, weights)
        depth, _ = runner.infer_depth(seq.frames[:1])
        preds[label] = np.asarray(depth[0])
        # one batched PoseNet call over all consecutive pairs (the
        # eval-hook pattern) — avoids compiling the chunked streaming
        # executor once per method; chaining + alignment on host
        rel6 = runner.infer_pose(seq.frames[:-1], seq.frames[1:])
        poses = chain_relative_poses(np.asarray(rel6))
        aligned = align_trajectory(poses[:, :3, 3],
                                   seq.poses[: len(poses), :3, 3].astype(np.float64))
        trajs[label] = aligned
        print(f"{label}: done", flush=True)

    if len(preds) < 2:
        print("fewer than 2 methods available — train cells first")
        return
    viz_depth_grid(seq.frames[0], seq.depths[0], preds,
                   os.path.join(out_dir, "qualitative_depth_methods.png"),
                   max_depth=cfg0.eval.depth_cap)
    viz_trajectory(trajs, os.path.join(out_dir, "trajectories_methods.png"))
    print(f"wrote {out_dir}/qualitative_depth_methods.png + trajectories_methods.png")


if __name__ == "__main__":
    main()
