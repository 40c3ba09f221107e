"""CLI entry points (SURVEY.md §1 CLI layer).

``python -m colvo.cli <command> [--config cfg.json] [--section.key=value ...]``

Commands: train · infer · vo · recon · eval · viz · export
(the family exposes train.py / test_simple.py / evaluate_*.py; here one
typed CLI over the pipelines layer).
"""

from __future__ import annotations

import argparse
import sys

from colvo.config import ColvoConfig


def _load_cfg(args, overrides) -> ColvoConfig:
    cfg = ColvoConfig.load(args.config) if args.config else ColvoConfig()
    if overrides:
        cfg.apply_overrides(overrides)
    return cfg


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(prog="colvo", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="DCDP+LCC self-supervised training (config 4)")
    p_train.add_argument("--config")
    p_train.add_argument("--log-dir", default="runs/train")
    p_train.add_argument("--max-steps", type=int, default=None)
    p_train.add_argument("--resume", action="store_true")

    p_infer = sub.add_parser("infer", help="single-frame depth inference (config 1)")
    p_infer.add_argument("frames", help="frame dir or video file")
    p_infer.add_argument("--config")
    p_infer.add_argument("--weights")
    p_infer.add_argument("--out", default="runs/infer")

    p_vo = sub.add_parser("vo", help="full-sequence VO (config 5)")
    p_vo.add_argument("frames", nargs="?", default=None,
                      help="frame dir / video (default: synthetic demo)")
    p_vo.add_argument("--config")
    p_vo.add_argument("--weights")
    p_vo.add_argument("--out", default="runs/vo")
    p_vo.add_argument("--no-recon", action="store_true")

    p_recon = sub.add_parser("recon", help="VO + 3D reconstruction → PLY")
    p_recon.add_argument("frames", nargs="?", default=None)
    p_recon.add_argument("--config")
    p_recon.add_argument("--weights")
    p_recon.add_argument("--out", default="runs/recon")

    p_eval = sub.add_parser("eval", help="depth+pose evaluation with figures")
    p_eval.add_argument("--config")
    p_eval.add_argument("--weights")
    p_eval.add_argument("--out", default="runs/eval")
    p_eval.add_argument("--data", default=None,
                        help="benchmark dir (VCD/CSD-style layout, see "
                        "colvo/data/benchmark.py); default: synthetic eval")
    p_eval.add_argument("--sequences", default=None,
                        help="comma-separated sequence subset")

    p_viz = sub.add_parser("viz", help="regenerate figures from a VO run dir")
    p_viz.add_argument("run_dir")

    p_export = sub.add_parser("export", help="export inference weights (.npz) from a checkpoint")
    p_export.add_argument("ckpt_dir")
    p_export.add_argument("out", help="output .npz path")
    p_export.add_argument("--config")

    p_imp = sub.add_parser(
        "import-torch",
        help="convert a family PyTorch checkpoint dir (encoder.pth/depth.pth"
        "[/pose_encoder.pth/pose.pth]) to inference weights (.npz)",
    )
    p_imp.add_argument("torch_dir")
    p_imp.add_argument("out", help="output .npz path")
    p_imp.add_argument("--config")

    args, overrides = parser.parse_known_args(argv)

    if args.command == "train":
        cfg = _load_cfg(args, overrides)
        from colvo.runtime import maybe_init_distributed

        maybe_init_distributed()  # multi-host SPMD when under a pod runtime
        from colvo.pipelines import train

        train(cfg, log_dir=args.log_dir, max_steps=args.max_steps, resume=args.resume)
    elif args.command == "infer":
        cfg = _load_cfg(args, overrides)
        from colvo.pipelines import infer_depth

        infer_depth(cfg, args.frames, args.out, args.weights)
    elif args.command in ("vo", "recon"):
        cfg = _load_cfg(args, overrides)
        from colvo.pipelines import run_vo_pipeline

        run_vo_pipeline(
            cfg, args.frames, out_dir=args.out, weights=args.weights,
            reconstruct=not getattr(args, "no_recon", False),
        )
    elif args.command == "eval":
        cfg = _load_cfg(args, overrides)
        if args.data:
            from colvo.pipelines import evaluate_dataset

            seqs = args.sequences.split(",") if args.sequences else None
            metrics = evaluate_dataset(
                cfg, args.data, weights=args.weights, out_dir=args.out,
                sequences=seqs,
            )
        else:
            from colvo.pipelines import evaluate_synthetic

            metrics = evaluate_synthetic(cfg, weights=args.weights, out_dir=args.out)
        for k, v in metrics.items():
            print(f"{k}: {v:.4f}")
    elif args.command == "viz":
        import numpy as np
        import os
        from colvo.evaluation import viz_trajectory

        poses = np.load(os.path.join(args.run_dir, "trajectory.npy"))
        viz_trajectory({"ColVO(ours)": poses[:, :3, 3]},
                       os.path.join(args.run_dir, "trajectory.png"))
        print(f"wrote {args.run_dir}/trajectory.png")
    elif args.command == "export":
        import jax

        cfg = _load_cfg(args, overrides)
        from colvo.runtime import CheckpointManager, export_params, init_state

        _, state = init_state(cfg, jax.random.key(0))
        mgr = CheckpointManager(args.ckpt_dir)
        state, step = mgr.restore(state)
        out = export_params(state.params, args.out)
        print(f"exported step-{step} params to {out}")
    elif args.command == "import-torch":
        import jax

        cfg = _load_cfg(args, overrides)
        # Family encoders are Conv→BatchNorm; the import target is the
        # BN-folded variant (colvo.runtime.torch_import docstring). The
        # family pose decoder takes the bare 512-ch bottleneck, so DCDP
        # fusion (our addition) is off for imported checkpoints.
        cfg.model.norm = "none"
        cfg.model.dcdp_fusion = False
        from colvo.runtime import export_params, init_state
        from colvo.runtime.torch_import import (
            import_family_checkpoint,
            load_family_checkpoint_dir,
        )

        _, state = init_state(cfg, jax.random.key(0))
        sds = load_family_checkpoint_dir(args.torch_dir)
        params = import_family_checkpoint(
            state.params,
            sds["encoder"],
            sds["depth"],
            sds.get("pose_encoder"),
            sds.get("pose"),
            num_layers=cfg.model.num_layers,
            n_scales=cfg.model.n_scales,
        )
        out = export_params(params, args.out)
        print(f"imported family checkpoint {args.torch_dir} -> {out} "
              f"(use with --model.norm=none --model.dcdp_fusion=false)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
