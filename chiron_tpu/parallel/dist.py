"""Distributed basecalling: multi-chip window sharding + multi-host file sharding.

Replaces the reference's parallel-inference story (TF queue threads on one
box, chiron_eval.py:262-372; nothing multi-host) with two orthogonal,
TPU-native mechanisms:

1. **Within a host (ICI)**: the decode step is wrapped in ``jax.shard_map``
   over a 1-D 'data' mesh — every chip runs the full forward+decode
   (including the Pallas kernels) on its shard of the window batch.
   Deterministic: results are concatenated in batch order, independent of
   device count.
2. **Across hosts (DCN)**: the fast5/file stream is sharded by stable file
   hash — each process basecalls a disjoint read subset and writes its own
   per-read outputs. Reads never span hosts, so no collective is needed on
   the hot path and the per-read regroup stays host-local (the reference's
   regroup-by-filename, chiron_eval.py:403-428, becomes trivially
   deterministic). ``merge_run_meta`` folds the per-host timing meta files.
"""

from __future__ import annotations

import hashlib
from typing import List

import jax
from jax.sharding import Mesh, PartitionSpec as P

from chiron_tpu.parallel.mesh import DATA_AXIS


def shard_files(file_list: List[str], num_shards: int, shard_index: int) -> List[str]:
    """Deterministic disjoint file sharding by stable content-independent hash."""
    out = []
    for name in file_list:
        h = int.from_bytes(hashlib.md5(name.encode()).digest()[:4], "big")
        if h % num_shards == shard_index:
            out.append(name)
    return out


def make_sharded_decode_step(step_fn, mesh: Mesh):
    """Wrap a (params, x, seq_len) decode step to run data-parallel.

    Every output of ``step_fn`` must have a leading batch axis.
    """
    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)


def process_info():
    """(process_index, process_count) — 1-process unless jax.distributed."""
    return jax.process_index(), jax.process_count()
