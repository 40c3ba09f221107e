"""Data layer (SURVEY.md §2.1, components D1–D5)."""

from colvo.data.sources import (
    FrameDirSource,
    VideoFrameSource,
    ArraySource,
    open_source,
)
from colvo.data.intrinsics import Intrinsics, scale_intrinsics
from colvo.data.snippets import Snippet, SnippetDataset, synthetic_dataset, batch_iterator
from colvo.data.augment import augment_snippet, color_jitter
from colvo.data.prefetch import prefetch_to_device
from colvo.data.benchmark import (
    BenchmarkSequence,
    list_sequences,
    load_benchmark_sequence,
)
from colvo.data.synthetic import (
    ColonSequence,
    render_frame,
    render_sequence,
    make_trajectory,
    colon_texture,
)

__all__ = [
    "FrameDirSource",
    "VideoFrameSource",
    "ArraySource",
    "open_source",
    "Intrinsics",
    "scale_intrinsics",
    "Snippet",
    "SnippetDataset",
    "synthetic_dataset",
    "batch_iterator",
    "augment_snippet",
    "color_jitter",
    "prefetch_to_device",
    "BenchmarkSequence",
    "list_sequences",
    "load_benchmark_sequence",
    "ColonSequence",
    "render_frame",
    "render_sequence",
    "make_trajectory",
    "colon_texture",
]
