"""Device meshes and sharding for data-parallel training over ICI.

The reference's entire distributed surface is single-node DDP + SyncBN +
`sync_dist` metric reduction (SURVEY §2.9; train_lidog.py:227-231).  The
TPU-native equivalent implemented here:

  * a 1-D `Mesh(('data',))` over all chips,
  * the train step runs under `jax.shard_map` with the batch sharded on
    its leading axis, parameters/optimizer state replicated,
  * gradient all-reduce and BatchNorm statistics ride `psum` over the
    `data` axis on ICI (lidog_tpu.ops.norm plumbs `axis_name`),
  * metric reduction is the same psum (replaces Lightning `sync_dist`).

Host-side input sharding (the DistributedSampler equivalent) lives in
lidog_tpu.data.loader: each host voxelizes and pads only its local shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict on the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
