"""Device mesh and sharding utilities — the SPMD replacement for the
reference's NCCL/DDP stack (SURVEY.md §5.8).

The reference launches one process per GPU, wraps the model in
DistributedDataParallel and sprinkles explicit `dist.all_reduce` calls for
loss normalizers (tools/plain_train_net.py:591-597,
dafne_outputs.py:44-50).  Here there is exactly ONE program: a jitted train
step whose batch input is sharded over the "data" axis of a
`jax.sharding.Mesh` and whose parameters are replicated.  Gradient
all-reduce and the loss-normalizer sums are collectives XLA inserts
automatically; they ride ICI on a real slice.

The mesh is N-D-ready (cfg.TPU.MESH_SHAPE / MESH_AXIS_NAMES) so spatial
sharding of large feature maps (the §5.7 "context parallel" analog) can be
added as an extra axis without touching the step function.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh; -1 entries absorb the remaining device count."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape if mesh_shape is not None else [-1])
    n = len(devices)
    known = int(np.prod([s for s in shape if s > 0])) or 1
    shape = [n // known if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def mesh_from_config(cfg, devices=None) -> Mesh:
    return create_mesh(cfg.TPU.MESH_SHAPE, cfg.TPU.MESH_AXIS_NAMES, devices)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree of host/local arrays onto every device of `mesh`.

    Single-process: plain device_put.  Multi-process: device_put raises
    "backend does not support cross-host device transfers" whenever a leaf
    is already committed to a local device — exactly what an orbax restore
    returns, so a multi-host `--resume` died here (caught by the
    kill/resume drill).  Every process holds the full value, so replication
    needs no communication at all: each process just materializes its
    addressable shards from its own local copy via make_array_from_callback.
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def leaf(x):
        v = np.asarray(x)
        return jax.make_array_from_callback(v.shape, sharding, lambda idx: v[idx])

    return jax.tree_util.tree_map(leaf, tree)


def image_sharding(mesh: Mesh, data_axis: str = "data",
                   spatial_axis: Optional[str] = None) -> NamedSharding:
    """[N, H, W, C] sharding: batch over `data_axis`, H over `spatial_axis`.

    Spatial sharding is this domain's context-parallelism (SURVEY.md §5.7):
    the conv feature maps of very large tiles are partitioned along H and
    XLA GSPMD inserts the halo exchanges for every conv/pool window — the
    hand-written ring/halo pass of a CUDA framework comes for free from the
    partitioner.  The program stays the single global-view jitted step.
    """
    if spatial_axis and spatial_axis in mesh.axis_names:
        return NamedSharding(mesh, P(data_axis, spatial_axis))
    return NamedSharding(mesh, P(data_axis))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data",
                spatial_axis: Optional[str] = None):
    """Device_put a host batch: leading dim over `axis`; images additionally
    over `spatial_axis` (H) when the mesh has one.

    Multi-process: `batch` holds this process's LOCAL rows (global_batch /
    process_count, see parallel.distributed.local_batch_slice); the global
    array is assembled with jax.make_array_from_process_local_data — no
    cross-host data movement, each host's rows live on its own chips.
    """
    sh = batch_sharding(mesh, axis)
    img_sh = image_sharding(mesh, axis, spatial_axis)
    pc = jax.process_count()

    def put(v, sharding):
        if pc == 1:
            return jax.device_put(v, sharding)
        global_shape = (v.shape[0] * pc,) + tuple(v.shape[1:])
        return jax.make_array_from_process_local_data(sharding, v, global_shape)

    out = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim") or v.ndim < 1:
            out[k] = v
        elif k == "image" and v.ndim == 4:
            out[k] = put(v, img_sh)
        else:
            out[k] = put(v, sh)
    return out
