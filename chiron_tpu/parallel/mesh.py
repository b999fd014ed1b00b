"""Device mesh construction and data-parallel sharding helpers.

TPU-native replacement for the reference's parallelism layer: the in-graph
multi-GPU towers with CPU gradient averaging (chiron/chiron_multi_gpu_train.py:
108-155) and the GCloud parameter-server config (config.yaml) both collapse
into one mechanism here — a 1-D ``jax.sharding.Mesh`` over all devices with
the batch sharded on the 'data' axis and parameters replicated. XLA GSPMD
inserts the psum gradient all-reduce over ICI automatically; across hosts
the same code runs under ``jax.distributed.initialize`` (see
``initialize_distributed``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the first n (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Assemble a batch pytree as batch-axis-sharded global arrays.

    Single-process: ``batch`` is the global batch and is device_put with
    batch-axis sharding. Multi-process (``jax.distributed``): ``batch`` is
    this process's LOCAL shard — global_batch/process_count rows — and the
    global array is assembled from per-process local data with no
    cross-host transfer (every process feeds only its own rows; this is
    what lets each host load only its file shard, unlike the reference's
    full-batch-everywhere queue feed, chiron_multi_gpu_train.py:115-119).
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def local_rows(global_array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in batch order.

    The inverse of ``shard_batch`` for reading results back: under
    multi-process meshes only the local shards are addressable, so host
    code (validation metrics, logging) must consume exactly the rows this
    process contributed.
    """
    shards = sorted(
        global_array.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(batch_arrays, multiple: int):
    """Pad leading axis to a multiple of the mesh size (static shapes)."""
    n = batch_arrays[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch_arrays, n
    out = []
    for arr in batch_arrays:
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        out.append(np.pad(arr, widths, mode="wrap"))
    return out, n


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host process setup (one JAX process per host).

    Replaces the reference's TF_CONFIG/GCloud ML Engine wiring
    (README.md:283-338): after this, ``jax.devices()`` spans all hosts and
    the same mesh/jit code scales across DCN.
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
