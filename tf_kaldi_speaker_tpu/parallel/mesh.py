"""Device mesh utilities: DP over ICI, batch/replicated shardings.

The reference has no in-process parallelism at all (SURVEY.md §2.5); here
data parallelism is the default execution mode: one jitted train step over a
1-D "data" mesh (scales to pods by adding a second "model" axis for the
sharded softmax in parallel/sharded_softmax.py). XLA inserts the gradient
psum and cross-replica batch-norm reductions automatically from the
shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence] = None, model_parallel: int = 1
) -> Mesh:
    """Build a (data[, model]) mesh over the given (default: all) devices.

    Multi-host note: ``jax.devices()`` orders devices by process, so the
    row-major reshape keeps each model-parallel group within one host as
    long as the LOCAL device count divides ``model_parallel`` — the layout
    the batch-assembly helpers (make_array_from_process_local_data over
    contiguous data-axis row blocks) rely on.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0
    if model_parallel > 1 and jax.process_count() > 1:
        assert jax.local_device_count() % model_parallel == 0, (
            "model_parallel=%d must divide the local device count (%d) so "
            "model groups do not straddle hosts"
            % (model_parallel, jax.local_device_count())
        )
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    if model_parallel == 1:
        return Mesh(arr[:, 0], (DATA_AXIS,))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_devices(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch size >= batch_size divisible by the data axis."""
    n = mesh.shape[DATA_AXIS]
    return ((batch_size + n - 1) // n) * n
