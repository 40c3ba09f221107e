"""Metrics / logging / observability (SURVEY.md component R5, §5.5).

``MetricsWriter`` emits a JSONL mirror always, TensorBoard event files when
TF is importable, and stdout lines. Logged per step: total/per-term losses,
LR, grad-norm, step-time, fps; per eval: depth metric table, ATE.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsWriter:
    def __init__(self, log_dir: str, also_stdout: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.also_stdout = also_stdout
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # TensorBoard is optional (SURVEY.md §5.5)
            from torch.utils.tensorboard import SummaryWriter  # torch-cpu ships it

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None
        self._t0 = time.time()

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        clean = {k: float(np.asarray(v)) for k, v in scalars.items()}
        rec = {"step": int(step), "time": time.time() - self._t0, **clean}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        if self.also_stdout:
            parts = " ".join(f"{k}={v:.5g}" for k, v in clean.items())
            print(f"[step {step}] {parts}", flush=True)

    def log_image(self, step: int, tag: str, img: np.ndarray) -> None:
        """img: (H, W, 3) float [0,1]. Saved as PNG panel + TB image."""
        import imageio.v2 as imageio

        path = os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step:08d}.png")
        imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))
        if self._tb is not None:
            self._tb.add_image(tag, np.transpose(img, (2, 0, 1)), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
