"""Pallas TPU kernel for the CTR k-mer lookup hot loop.

The reference's inner loop (xtSuffixBS, itree.c:699-730) is a binary search
over a prefix bin — pure pointer-chasing, the worst case for any vector
machine.  The TPU-native strategy here splits it:

  1. NARROW (XLA, vectorized): replay the exact probe sequence only until the
     remaining range fits a fixed window W (static probe count).  For typical
     bins (numK/2^24 entries) this is zero or a few steps.
  2. FETCH+FINISH (Pallas): per query, one async DMA pulls its W-record
     window (packed 8B records: lo32 | hi8+ix<<8) from HBM into VMEM —
     double-buffered so DMA issue overlaps the vectorized compare — then the
     REMAINING probe steps run on the VMEM window, preserving the reference's
     exact probe sequence (quirky merged bins included).

Records are packed as two int32 lanes per record:
  lane0 = suffix bits 31..0
  lane1 = suffix bits 39..32 | (label_ix << 8)
so one DMA fetches suffix and label together.

This kernel exists for the HBM-resident multi-GB table regime; for small
tables XLA's fused gather path (lookup.lookup_kmers) is already
bandwidth-bound and either can be selected per index size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _narrow(bin_ix, qpre, qhi, qlo, suf_hi, suf_lo, probe_iters, window_log2):
    """Exact probe replay until range size < 2^window_log2 (XLA phase)."""
    n = suf_hi.shape[0] - 1
    start = bin_ix[qpre].astype(jnp.int32)
    end = bin_ix[qpre + 1].astype(jnp.int32)
    empty = start >= end
    p = jnp.where(empty, 0, start)
    size = jnp.where(empty, 0, end - start - 1)
    steps = max(0, probe_iters - window_log2)

    qlo_u = qlo.astype(jnp.uint32)

    def body(_, carry):
        p, size = carry
        active = size >= (1 << window_log2)
        w = size >> 1
        probe = jnp.minimum(p + w + 1, n)
        le = active & (
            (suf_hi[probe] < qhi)
            | ((suf_hi[probe] == qhi) & (suf_lo[probe].astype(jnp.uint32) <= qlo_u))
        )
        p = jnp.where(le, p + w + 1, p)
        size = jnp.where(active, jnp.where(le, size - w - 1, w), size)
        return p, size

    p, size = jax.lax.fori_loop(0, steps, body, (p, size))
    return p, size, empty


def _lookup_kernel(p_ref, size_ref, qhi_ref, qlo_ref, packed_hbm, out_ref,
                   win_scratch, sems, *, window: int, block: int, window_log2: int):
    """One grid step = `block` queries.  Double-buffered per-query window DMA
    followed by the remaining exact probe steps on the VMEM window."""

    def issue(slot, qi):
        # clamp so the fixed-size window DMA stays in bounds (table is padded)
        src = packed_hbm.at[pl.ds(p_ref[qi], window)]
        return pltpu.make_async_copy(src, win_scratch.at[slot], sems.at[slot])

    issue(0, 0).start()

    def body(qi, _):
        slot = qi % 2

        @pl.when(qi + 1 < block)
        def _():
            issue((qi + 1) % 2, qi + 1).start()

        issue(slot, qi).wait()
        win = win_scratch[slot]  # (window, 2) int32
        lo = win[:, 0]
        hi8 = win[:, 1] & 0xFF
        ix = jax.lax.shift_right_logical(win[:, 1], 8)
        qhi = qhi_ref[qi]
        qlo = qlo_ref[qi]
        size0 = size_ref[qi]

        # remaining probe steps relative to window start (exact sequence)
        def probe_body(_, carry):
            pp, ss = carry
            active = ss > 0
            w = ss >> 1
            j = jnp.minimum(pp + w + 1, window - 1)
            sel_hi = jax.lax.dynamic_index_in_dim(hi8, j, keepdims=False)
            sel_lo = jax.lax.dynamic_index_in_dim(lo, j, keepdims=False)
            le = active & (
                (sel_hi < qhi)
                | ((sel_hi == qhi) & (sel_lo.astype(jnp.uint32) <= qlo.astype(jnp.uint32)))
            )
            pp = jnp.where(le, pp + w + 1, pp)
            ss = jnp.where(active, jnp.where(le, ss - w - 1, w), ss)
            return pp, ss

        pp, _ = jax.lax.fori_loop(0, window_log2, probe_body, (jnp.int32(0), size0))
        pp = jnp.minimum(pp, window - 1)
        f_hi = jax.lax.dynamic_index_in_dim(hi8, pp, keepdims=False)
        f_lo = jax.lax.dynamic_index_in_dim(lo, pp, keepdims=False)
        f_ix = jax.lax.dynamic_index_in_dim(ix, pp, keepdims=False)
        found = (f_hi == qhi) & (f_lo == qlo)
        out_ref[qi] = jnp.where(found, f_ix, jnp.int32(-1))
        return 0

    jax.lax.fori_loop(0, block, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("probe_iters", "bad_ix", "window", "block", "interpret"),
)
def pallas_lookup_kmers(
    table: dict,
    qpre: jax.Array,
    qhi: jax.Array,
    qlo: jax.Array,
    valid: jax.Array,
    probe_iters: int,
    bad_ix: int,
    window: int = 16,
    block: int = 256,
    interpret: bool = False,
):
    """Drop-in peer of lookup.lookup_kmers backed by the Pallas kernel.

    `table` additionally needs `packed` (N+window, 2) int32 (see
    DeviceIndexArrays.packed_records).
    """
    window_log2 = int(np.log2(window))
    assert 1 << window_log2 == window
    shape = qpre.shape
    pre = jnp.where(valid, qpre, 0).reshape(-1)
    qhi_f = qhi.reshape(-1)
    qlo_f = qlo.reshape(-1)
    n_q = pre.shape[0]
    pad = (-n_q) % block
    if pad:
        pre = jnp.pad(pre, (0, pad))
        qhi_f = jnp.pad(qhi_f, (0, pad))
        qlo_f = jnp.pad(qlo_f, (0, pad))
    p, size, empty = _narrow(
        table["bin_ix"], pre, qhi_f, qlo_f, table["suf_hi"], table["suf_lo"],
        probe_iters, window_log2,
    )

    grid = (p.shape[0] // block,)
    kernel = functools.partial(
        _lookup_kernel, window=window, block=block, window_log2=window_log2
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed table stays in HBM
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((p.shape[0],), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, window, 2), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p, size, qhi_f, qlo_f, table["packed"])

    res = out[:n_q].reshape(shape)
    ok = valid & ~empty[:n_q].reshape(shape) & (res >= 0)
    return jnp.where(ok, res, bad_ix)
