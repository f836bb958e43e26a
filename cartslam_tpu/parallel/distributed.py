"""Multi-host initialization: DCN across hosts, ICI within each slice.

SURVEY §5.8's scale-out story beyond one host: each host runs one process
per the standard JAX multi-controller model; `jax.distributed.initialize`
wires the coordination service, after which `jax.devices()` spans every
host and the existing mesh builders (MultiSeqSystem's 1-D ``data`` mesh,
SpatialFlagship's ``spatial`` axis) transparently cover the full slice.

Sharding guidance for this workload (a perception pipeline, not a
trainer):
  * multiseq (throughput): shard the batch so each host keeps its own
    sequences — the hot path has ZERO collectives, so nothing rides DCN;
    only checkpoint gathers cross hosts.
  * spatial (latency): keep one frame's row shards WITHIN a host's ICI
    domain (halos every stage would crawl over DCN); scale further by
    giving different frames/sequences to different hosts.

Config: ``{"parallel": {"multihost": {"coordinator": "10.0.0.1:1234",
"num_processes": 4, "process_id": 0}}}`` — fields may also come from the
standard environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID, or a supported cluster environment where initialize()
auto-detects everything).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("cart.distributed")


def initialize_multihost(cfg: dict | None = None) -> bool:
    """Wire `jax.distributed` from config/environment; returns True when a
    multi-host runtime was initialized (False for the single-host case).

    Idempotent: repeated calls after a successful initialize are no-ops.
    """
    import jax

    cfg = dict(cfg or {})
    coordinator = cfg.get(
        "coordinator", os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    num_processes = cfg.get(
        "num_processes", os.environ.get("JAX_NUM_PROCESSES")
    )
    process_id = cfg.get("process_id", os.environ.get("JAX_PROCESS_ID"))

    if coordinator is None and num_processes is None:
        # Single host (or an auto-detecting cluster env the user opted out
        # of) — nothing to do.
        return False

    if getattr(initialize_multihost, "_done", False):
        return True

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = str(coordinator)
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    initialize_multihost._done = True
    log.info(
        "multi-host runtime up: process %s/%s, %d global devices "
        "(%d local)",
        jax.process_index(), jax.process_count(),
        len(jax.devices()), len(jax.local_devices()),
    )
    return True


def global_data_mesh(axis: str = "data"):
    """1-D mesh over EVERY device in the (possibly multi-host) runtime.

    With multiseq sharding, each host's sequences land on its own local
    devices (jax places consecutive batch shards on consecutive devices),
    so the lock-step rounds exchange nothing over DCN.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
