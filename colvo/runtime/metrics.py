"""Metrics / logging / observability (SURVEY.md component R5, §5.5).

``MetricsWriter`` emits a JSONL mirror always, TensorBoard event files when
TF is importable, and stdout lines. Logged per step: total/per-term losses,
LR, grad-norm, step-time, fps; per eval: depth metric table, ATE.

``AsyncMetricsLogger`` moves the device→host metric fetch off the training
loop's critical path: a synchronous fetch of freshly computed scalars
drains the whole dispatch queue through a slow host link (a single sync
costs up to ~1 s through this environment's tunnel). A daemon thread
performs the blocking fetch + write; the loop only
enqueues device arrays (non-blocking, drop-oldest beyond a small backlog).
The NaN-abort guard (§5.3) consequently fires a few steps late — the
thread sets a flag the loop checks each step.
"""

from __future__ import annotations

import json
import os
import queue
import threading
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


class AsyncMetricsLogger:
    """Non-blocking front end over ``MetricsWriter`` (see module docstring).

    ``log`` enqueues still-on-device metric arrays and returns immediately;
    a daemon thread fetches and writes them. ``bad_steps`` counts
    consecutive non-finite total losses observed by the thread — the
    training loop polls it for the abort guard.
    """

    def __init__(
        self,
        writer: MetricsWriter,
        loss_key: str = "loss/total",
        max_pending: int = 4,
        fps_scale: float = 0.0,
    ):
        self.writer = writer
        self.loss_key = loss_key
        self.bad_steps = 0
        self.dropped = 0
        self.fps_scale = fps_scale  # batch size; 0 disables the fps column
        self._last_done: Optional[tuple] = None  # (step, fetch-complete time)
        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def log(self, step: int, metrics: Dict) -> None:
        """Enqueue without blocking; drop when the writer lags (the slow
        link sets the logging rate, not the training rate)."""
        try:
            self._q.put_nowait((step, time.time(), metrics))
        except queue.Full:
            self.dropped += 1

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            self._process(item)

    def _process(self, item) -> None:
        step, enq_t, metrics = item
        try:
            vals = {k: float(np.asarray(v)) for k, v in metrics.items()}
        except Exception:
            self.bad_steps += 1
            return
        loss = vals.get(self.loss_key)
        if loss is not None and not np.isfinite(loss):
            self.bad_steps += 1
        else:
            self.bad_steps = 0
        # Honest throughput without syncing the training loop: the blocking
        # fetch above pins this thread's clock to computed work, so
        # consecutive fetch-completion times bound the real step rate — but
        # ONLY when this thread was idle-waiting for the item. If the item
        # was enqueued before the previous fetch completed (a backlog —
        # this platform executes dispatched steps in bursts), the gap
        # measures queue-drain speed, not training, and reads ~100-1000x
        # too fast; skip the stamp. The unambiguous number is the training
        # loop's end-of-run wall_steps_per_sec (loop.py).
        now = time.time()
        if (
            self._last_done is not None
            and step > self._last_done[0]
            and enq_t >= self._last_done[1]
        ):
            sps = (step - self._last_done[0]) / max(now - self._last_done[1], 1e-9)
            vals["steps_per_sec"] = sps
            if self.fps_scale:
                vals["fps"] = sps * self.fps_scale
        self._last_done = (step, now)
        self.writer.log_scalars(step, vals)

    def close(self) -> None:
        self._q.put(None)
        self._thread.join()
        self.writer.close()
