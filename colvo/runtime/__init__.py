"""Training & inference runtime (SURVEY.md §2.5, components R1–R7)."""

from colvo.runtime.train_step import (
    TrainState,
    init_state,
    make_optimizer,
    make_train_step,
    make_scan_train,
)
from colvo.runtime.mesh import (
    cross_process_barrier,
    make_mesh,
    maybe_init_distributed,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)
from colvo.runtime.checkpoint import (
    CheckpointManager,
    export_params,
    load_params,
    fold_batchnorm,
    torch_conv_to_hwio,
)
from colvo.runtime.metrics import MetricsWriter
from colvo.runtime.loop import train
from colvo.runtime.infer import InferenceRunner

__all__ = [
    "TrainState",
    "init_state",
    "make_optimizer",
    "make_train_step",
    "make_scan_train",
    "cross_process_barrier",
    "make_mesh",
    "maybe_init_distributed",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "CheckpointManager",
    "export_params",
    "load_params",
    "fold_batchnorm",
    "torch_conv_to_hwio",
    "MetricsWriter",
    "train",
    "InferenceRunner",
]
