"""Device-mesh helpers for multi-chip execution.

The reference's only parallelism was single-process in-graph GPU towers
plus a ZMQ data feed (SURVEY.md §2.5). Here scaling is mesh-based: a
('data', 'spatial') mesh; batch is sharded over 'data' (DP) and the
image height over 'spatial' (the conv analogue of sequence parallelism
— XLA GSPMD inserts halo exchanges for the convolutions). Gradients
are all-reduced over ICI by XLA when the jitted train step consumes
sharded batches with replicated params.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial <= len(devices), (
        f"need {n_data}x{n_spatial} devices, have {len(devices)}")
    grid = np.asarray(devices[:n_data * n_spatial]).reshape(
        n_data, n_spatial)
    return Mesh(grid, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = 1
                   ) -> NamedSharding:
    """NHWC batch: N over 'data', H over 'spatial' (None disables)."""
    if spatial_axis is None or mesh.shape["spatial"] == 1:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Batch-dict keys with NHWC spatial layout; everything else (e.g.
# 'joints' (N, people, 18, 2)) is data-sharded only even when a
# spatial mesh axis is active.
SPATIAL_KEYS = ("image", "heat", "paf")


def shard_batch(mesh: Mesh, arrays, spatial_axis: Optional[int] = 1,
                spatial_keys: Sequence[str] = SPATIAL_KEYS):
    """Place host arrays onto the mesh with batch/spatial sharding.

    For dict batches, only ``spatial_keys`` entries get their spatial
    axis sharded — coordinate-shaped entries ride the data axis alone.
    """
    sh = batch_sharding(mesh, spatial_axis)
    if isinstance(arrays, dict) and spatial_axis is not None:
        data_only = batch_sharding(mesh, None)
        return {k: jax.device_put(v, sh if k in spatial_keys
                                  else data_only)
                for k, v in arrays.items()}
    return jax.tree.map(lambda a: jax.device_put(a, sh), arrays)
