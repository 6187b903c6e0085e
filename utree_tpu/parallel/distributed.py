"""Multi-host deployment helpers.

The reference is strictly single-node (SURVEY.md §2.3).  Multi-host here is
standard JAX SPMD: one process per host (`jax.distributed.initialize`), a
global mesh over all devices, per-host input pipelines feeding each host's
addressable shard of the read batch, and deterministic collective merges so
sample-level outputs are bit-identical at any host count.

This module is exercised on single-process virtual meshes in CI; on a real
pod slice call `init_distributed()` before anything else touches JAX.
"""

from __future__ import annotations

import jax
import numpy as np


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-process JAX (DCN across hosts, ICI within a slice).
    No-ops on a single process with no coordinator configured."""
    if coordinator is None and num_processes is None:
        return  # single-process (or env-configured TPU pod auto-detection)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_read_range(total_reads: int, process_index: int | None = None,
                    process_count: int | None = None) -> tuple[int, int]:
    """Deterministic per-host slice of the read set: host h takes the
    contiguous range [h*ceil(N/H), ...) so global read order (and therefore
    merged output order) is independent of host count."""
    h = jax.process_index() if process_index is None else process_index
    nh = jax.process_count() if process_count is None else process_count
    per = -(-total_reads // nh)
    lo = min(h * per, total_reads)
    return lo, min(lo + per, total_reads)


def merge_sample_tallies(local_tally: np.ndarray, mesh) -> np.ndarray:
    """Sum per-label tallies across the whole mesh (integer psum — exact and
    order-independent, unlike the reference's thread-completion-order writes,
    itree.c:1009-1101)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def f(x):
        return jax.lax.psum(x, ("data", "table"))

    return np.asarray(
        jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=P(), out_specs=P())
        )(jnp.asarray(local_tally))
    )
