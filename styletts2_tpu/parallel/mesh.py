"""Device mesh and sharding utilities.

The reference's only parallelism is single-process torch DataParallel
(reference train.py:24-29) plus a distributed-capable batch sampler
(meldataset.py:228-307). The TPU-native design is SPMD:

* a 1-D 'dp' mesh over local devices (ICI); per-host input sharding over
  DCN uses the sampler's existing (num_replicas, rank) interface
* params/optimizer state replicated; batches sharded on 'dp'; XLA inserts
  the gradient all-reduces over ICI

The vocoder's frame axis can additionally shard over a mesh axis with halo
exchange for very long chunks (SURVEY section 5 notes this is the only
place sequence parallelism is meaningful in this architecture) — see
parallel/seqpar.py (sp_decoder_apply).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = -1, axis: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first n local devices (-1 = all)."""
    devices = jax.devices()
    if n_devices > 0:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host batch (pytree of arrays with a leading batch dim) onto
    the mesh, sharded along the batch axis.

    Multi-host: each process passes its LOCAL shard (the duration-binned
    sampler already hands out disjoint per-rank batches) and a global array
    is assembled across processes — the batch axis spans DCN while the
    gradient all-reduce rides ICI within each host."""
    sharding = data_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)
