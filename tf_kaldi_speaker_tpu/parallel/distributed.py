"""Multi-host (DCN) initialization and per-host data sharding helpers.

The reference's only cross-node story is the Kaldi job scheduler (cmd.sh,
SURVEY.md §2.5); here multi-host training is the same SPMD program over a
global mesh: call :func:`initialize` once per host before building the
Trainer, and give each host's loader a disjoint seed/shard via
:func:`host_shard_info`. All shardings in the Trainer are global —
``jax.make_array_from_process_local_data`` assembles the global batch from
per-host chunks.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

log = logging.getLogger("tfks.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op if single."""
    if num_processes in (None, 1) and coordinator_address is None:
        log.info("Single-process run; skipping jax.distributed.")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_shard_info() -> Tuple[int, int]:
    """(host_index, num_hosts) for seeding per-host data loaders."""
    return jax.process_index(), jax.process_count()


def per_host_batch(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, "global batch must divide across hosts"
    return global_batch // n


def global_batch_from_local(local_array, global_sharding):
    """Assemble a globally-sharded array from this host's local shard."""
    return jax.make_array_from_process_local_data(global_sharding, local_array)
