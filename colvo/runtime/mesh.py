"""Device mesh / data-parallel runtime (SURVEY.md component R3, §5.8).

The TPU-native equivalent of the family's NCCL/DDP: a 1-D device mesh over
ICI, batch sharded on the ``data`` axis, params replicated. Gradients are
all-reduced by XLA-inserted collectives (``psum`` in the lowered HLO) —
no transport code to write; the deliverable is this mesh/sharding layer
and its tests (SURVEY.md §4.5). Multi-host SPMD extends the same program
via ``jax.distributed.initialize`` with XLA routing inter-slice traffic
over DCN automatically.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colvo.config import MeshConfig


def maybe_init_distributed() -> bool:
    """Initialize multi-host SPMD when launched under a pod runtime.

    Call once at process start (the CLI does). Uses the standard JAX
    cluster auto-detection (``jax.distributed.initialize`` reads the TPU
    pod/GKE/Slurm environment); afterwards ``jax.devices()`` spans all
    hosts and the same mesh/sharding program runs SPMD with XLA routing
    inter-slice traffic over DCN (SURVEY.md §5.8). No-op on a single
    host. Returns True when distributed mode was initialized.
    """
    import os
    import warnings

    # Env check BEFORE any jax call — jax.distributed.initialize() must
    # run before the XLA backend initializes. An explicit coordinator (or
    # COLVO_MULTIHOST=1 with pod auto-detection) is required:
    # single-host TPU VMs also export worker-topology vars, so topology
    # alone must not trigger multi-host mode.
    if not (
        os.environ.get("COLVO_MULTIHOST") == "1"
        or any(v in os.environ for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        ))
    ):
        return False
    # Pass explicit coordinates when the launcher provides them (covers
    # plain-process launches — e.g. the 2-process CPU smoke test — where
    # none of JAX's cluster auto-detectors apply); otherwise defer to
    # auto-detection (TPU pod / GKE / Slurm).
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if addr and "JAX_NUM_PROCESSES" in os.environ and "JAX_PROCESS_ID" in os.environ:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # backend already up, or no cluster found
        warnings.warn(f"multi-host init skipped: {e}")
        return False
    return jax.process_count() > 1


def cross_process_barrier(name: str, timeout_s: float = 600.0) -> bool:
    """Block until every process reaches this barrier (no-op single-host).

    Rides the coordination service (the same TCP channel
    ``jax.distributed.initialize`` rendezvoused on), NOT the collective
    transport — so it works before any collective has run and its timeout
    is ours to choose. Use it to line processes up immediately before the
    FIRST executed collective: Gloo/DCN context creation has a fixed ~30 s
    connect deadline measured from when the first process arrives, which
    slow or unevenly-loaded hosts miss when their compile phases drift
    apart (SURVEY.md §5.8; the 2-process smoke test on a 1-core host).
    Compile ahead (``jit(...).lower(...).compile()`` executes nothing),
    barrier here, then execute. Returns True when a barrier was actually
    performed.
    """
    if jax.process_count() <= 1:
        return False
    try:
        # jax._src.distributed is private with no stability guarantee; an
        # upgrade that moves it must degrade to the public barrier below
        # rather than break multihost startup (ADVICE r3).
        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            return False
        client.wait_at_barrier(name, int(timeout_s * 1000))
        return True
    except (ImportError, AttributeError):
        # Public fallback: sync_global_devices rendezvouses every process.
        # It rides a collective (psum over all devices), so unlike the
        # coordination-service barrier it needs the collective transport up
        # — acceptable as a degraded path on newer JAX.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
        return True


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the slice's chips (ICI-connected)."""
    cfg = cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
    n = cfg.data_parallel if cfg.data_parallel > 0 else len(devices)
    if n > len(devices):
        raise ValueError(f"requested DP={n} but only {len(devices)} devices")
    return Mesh(np.array(devices[:n]), (cfg.axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host batch dict on the mesh: arrays with a leading batch dim
    shard over ``data``; scalars/small arrays (e.g. K) replicate."""
    bs = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0 and x.shape[0] > 1:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree.map(place, batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
