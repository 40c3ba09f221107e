"""End-to-end demo: train on rendered colon sequences, evaluate, figure set.

Trains DCDP+LCC on synthetic colon renders (no real data is reachable —
SURVEY.md §7 hard part 3), exports weights, then runs the full evaluation
pipeline (depth metrics, ATE, reconstruction, the three reference figure
types) on a held-out sequence. Artifacts land in runs/demo/.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def main(max_steps=12000, out_dir="runs/demo"):
    import jax
    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, render_sequence
    from colvo.pipelines import evaluate_synthetic, make_training_eval_hook
    from colvo.runtime import export_params, train as train_loop

    cfg = ColvoConfig()
    cfg.data.loader = "device"
    cfg.train.ckpt_dir = os.path.join(out_dir, "ckpt")
    cfg.train.log_every = 500
    cfg.train.ckpt_every_steps = max_steps  # final checkpoint only (demo)
    cfg.train.eval_every_epochs = 25  # ~1k-step cadence on this corpus

    # richer synthetic corpus than the default demo dataset
    seqs, ks = [], []
    for i in range(8):
        seq = render_sequence(n_frames=64, height=cfg.data.height,
                              width=cfg.data.width, seed=100 + 7 * i)
        seqs.append(seq.frames)
        ks.append(seq.k)
    ds = SnippetDataset(seqs, ks, cfg.data.frame_offsets)
    print(f"corpus: {len(ds)} snippets from {len(seqs)} sequences")

    t0 = time.time()
    model, state = train_loop(cfg, ds, log_dir=os.path.join(out_dir, "train"),
                              max_steps=max_steps,
                              eval_hook_factory=make_training_eval_hook)
    print(f"trained {max_steps} steps in {time.time()-t0:.0f}s")
    weights = export_params(jax.tree.map(np.asarray, state.params),
                            os.path.join(out_dir, "weights.npz"))

    metrics = evaluate_synthetic(cfg, weights=weights,
                                 out_dir=os.path.join(out_dir, "eval"))
    for k, v in metrics.items():
        print(f"  {k:16s} {v:.4f}")


if __name__ == "__main__":
    main(max_steps=int(sys.argv[1]) if len(sys.argv) > 1 else 12000)
