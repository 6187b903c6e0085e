"""Device mesh construction.

Axes:
  data   — read batches are sharded here (the DP axis; the reference's
           OpenMP thread-per-read loop, itree.c:1009, scaled to chips)
  table  — the k-mer table is sharded by 24-bit prefix range here (the
           TP/EP-shaped axis; no analog in the reference, which holds the
           whole CTR in one node's RAM)

Long-read sequence parallelism reuses the `data` axis (positions of one read
sharded instead of reads).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int | None = None, table: int = 1, devices=None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    total = devs.size
    if data is None:
        data = total // table
    if data * table != total:
        raise ValueError(f"mesh {data}x{table} != {total} devices")
    return Mesh(devs.reshape(data, table), axis_names=("data", "table"))
