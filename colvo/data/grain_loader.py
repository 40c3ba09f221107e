"""grain-backed input pipeline (SURVEY.md component D2, §5.3 iterator state).

Multi-worker, checkpointable loader over :class:`SnippetDataset` with the
same batch contract as ``batch_iterator`` ({frames, frames_clean, k}).
grain owns worker processes and per-record determinism (seeded sampler);
its iterator state serializes, giving exact input-pipeline resume on
restart (SURVEY.md §5.3 "grain restores iterator state").
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

import grain.python as gp

from colvo.config import DataConfig
from colvo.data.augment import augment_snippet
from colvo.data.snippets import SnippetDataset


class _SnippetSource(gp.RandomAccessDataSource):
    """grain random-access view of a SnippetDataset (frames + K)."""

    def __init__(self, dataset: SnippetDataset):
        self._ds = dataset

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx):
        s = self._ds[int(idx)]
        return {"frames": s.frames, "k": s.k}

    def __repr__(self) -> str:
        # grain validates resumed iterator state via repr(data_source);
        # the default object repr embeds the process-local id() and would
        # reject every cross-process restore. Content-derived identity —
        # including a cheap fingerprint of the first sample's bytes, so a
        # state checkpointed against a *different* corpus with matching
        # shape/length is rejected instead of silently resuming wrong data.
        if len(self._ds) == 0:
            return "_SnippetSource(n=0)"
        import zlib

        first = self._ds[0]
        fp = zlib.adler32(np.ascontiguousarray(first.frames).tobytes())
        return (
            f"_SnippetSource(n={len(self._ds)}, "
            f"frames={tuple(first.frames.shape)}, "
            f"dtype={first.frames.dtype}, fp={fp:08x})"
        )


class _AugmentBatch(gp.RandomMapTransform):
    """Per-batch augmentation with grain-provided RNG (deterministic)."""

    def __init__(self, cfg: DataConfig):
        self._cfg = cfg

    def random_map(self, batch, rng: np.random.Generator):
        frames = batch["frames"]
        if self._cfg.augment:
            aug, clean = augment_snippet(frames, self._cfg, rng)
        else:
            aug = clean = frames
        return {"frames": aug, "frames_clean": clean, "k": batch["k"][0]}


def grain_loader(
    dataset: SnippetDataset,
    cfg: DataConfig,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: Optional[int] = None,
):
    """Build a grain DataLoader yielding the standard batch dict.

    The returned loader's iterator supports ``get_state``/``set_state``
    (via grain's PyGrainCheckpointHandler) for exact resume.
    """
    source = _SnippetSource(dataset)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=gp.ShardByJaxProcess(drop_remainder=True),
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed,
    )
    # Default to in-process: snippet sources are in-memory arrays (decode
    # happens upfront), so worker processes only add IPC copies — and forked
    # workers re-initialize the TPU plugin in this environment.
    workers = 0 if worker_count is None else worker_count
    return gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[
            gp.Batch(batch_size=cfg.batch_size, drop_remainder=True),
            _AugmentBatch(cfg),
        ],
        worker_count=workers,
    )


class StatefulGrainIterator:
    """grain iterator wrapper that keeps a short history of serialized
    states keyed by batches-yielded count (SURVEY.md §5.3/§5.4).

    The training loop prefetches a couple of batches ahead of the step
    being checkpointed, so ``it.get_state()`` *at save time* points past
    the checkpointed step and a restore would silently skip batches.
    This wrapper records ``get_state()`` after every ``__next__`` so the
    loop can ask for the state matching exactly N consumed batches
    (``state_at(N)``) — the resumed stream is then the bitwise
    continuation (tests/test_checkpoint.py::test_grain_resume_bitwise).
    """

    def __init__(self, it, keep: int = 16):
        # keep must exceed the consumer's prefetch depth (the gap between
        # batches pulled and the step being checkpointed); states are tiny
        # JSON blobs so a generous margin is free.
        import threading

        self._it = it
        self._keep = max(2, keep)
        self._count = 0
        self._states = {0: it.get_state()}
        # __next__ runs on the prefetch producer thread while state_at is
        # called from the training loop — guard the shared history.
        self._lock = threading.Lock()

    def __iter__(self):
        return self

    def __next__(self):
        batch = next(self._it)
        with self._lock:
            self._count += 1
            self._states[self._count] = self._it.get_state()
            self._states.pop(self._count - self._keep, None)
        return batch

    @property
    def count(self) -> int:
        return self._count

    def state_at(self, n_consumed: int) -> bytes:
        """Serialized iterator state after exactly ``n_consumed`` batches."""
        with self._lock:
            try:
                return self._states[n_consumed]
            except KeyError:
                have = sorted(self._states)
                raise KeyError(
                    f"grain iterator state for batch count {n_consumed} was "
                    f"evicted (retained: {have[0]}..{have[-1]}, keep="
                    f"{self._keep}). The consumer prefetched more than "
                    f"`keep` batches past the checkpointed step — construct "
                    f"grain_batch_iterator with keep >= prefetch depth + "
                    f"checkpoint lag."
                ) from None

    def set_state(self, state: bytes) -> None:
        """Restore; the count/history restart at the restored position."""
        with self._lock:
            self._it.set_state(state)
            self._count = 0
            self._states = {0: self._it.get_state()}


def grain_batch_iterator(
    dataset: SnippetDataset, cfg: DataConfig, seed: int = 0,
    num_epochs: Optional[int] = None, keep: int = 16,
) -> StatefulGrainIterator:
    """Iterator facade matching ``batch_iterator``'s contract, with
    checkpointable position (``state_at``/``set_state``). ``keep`` bounds
    the retained state history and must exceed the consumer's prefetch
    depth (the training loop derives it from its prefetch size)."""
    return StatefulGrainIterator(
        iter(grain_loader(dataset, cfg, seed, num_epochs)), keep=keep
    )
