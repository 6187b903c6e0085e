"""Fused Pallas kernels around the canonical-hash gathers (the hot path).

The single-chip search step is three stages:

  1. windows -> canonical keys + bucket ids      (elementwise, VPU)
  2. t1/t2 row gathers                           (random HBM access)
  3. slot compares -> per-read histogram         (elementwise + reductions)

Stage 2 is gather-rate-bound and XLA's gather is already at the device's
random-access speed (measured ~14.8ns/row on v5e for 24-32B rows, table size
independent), so it stays an XLA gather.  Stages 1 and 3, left to XLA,
materialize every intermediate (B, W) array in HBM — measured ~210ms of a
~350ms batch.  These kernels run them in VMEM tiles instead:

  pregather_canonical   qpre/qhi/qlo/valid tiles -> bucket1, bucket2,
                        key_lo, key_hi, flags(valid|fwd_le<<1)
  postgather_hist       gathered rows + keys -> packed per-read histogram
                        (the exact compact_histogram contract, u16-packed)

Both are bit-exact twins of the XLA path (lookup.lookup_kmers_canonical +
lookup.compact_histogram); tests compare them directly.  The replaced
reference loop is the per-base probe + vote tally of XT_WORD_SEARCH /
XT_FULLVOTE (itree.c:903-933, 1033-1041).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 0x7FFFFFFF  # miss sentinel (python int: jnp constants cannot be captured by kernels)


def _interpret_default() -> bool:
    # Mosaic only lowers on real TPU backends; CPU tests run interpreted
    return jax.default_backend() in ("cpu", "gpu")


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _rev2_32_u(x):
    """Reverse the 2-bit groups of a uint32 lane (base-order reversal)."""
    x = ((x & jnp.uint32(0x33333333)) << jnp.uint32(2)) | ((x >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | ((x >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | ((x >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF))
    return (x << jnp.uint32(16)) | (x >> jnp.uint32(16))


def _mix_u(hi24_8, lo):
    """uint32 twin of hash_index._mix_np on (pre24<<8|hi8 split, lo32)."""
    m1 = jnp.uint32(0x9E3779B1)
    m2 = jnp.uint32(0x85EBCA6B)
    m3 = jnp.uint32(0xC2B2AE35)
    pre = hi24_8 >> jnp.uint32(8)
    hi8 = hi24_8 & jnp.uint32(0xFF)
    h = pre * m1
    h = h ^ (lo ^ (lo >> jnp.uint32(16)))
    h = h * m2
    h = h ^ (h >> jnp.uint32(13))
    h = h + hi8 * m3
    h = h ^ (h >> jnp.uint32(16))
    return h


def _pregather_kernel(qpre_ref, qhi_ref, qlo_ref, valid_ref,
                      bkt1_ref, bkt2_ref, keylo_ref, keyhi_ref, flags_ref,
                      *, b1: int, b2: int):
    """Elementwise: forward word lanes -> canonical key, bucket ids, flags.

    Must mirror lookup.lookup_kmers_canonical's key/bucket math bit-for-bit
    (same mixes as hash_index builder)."""
    lo_u = _u32(qlo_ref[...])
    fwd_hi32 = (_u32(qpre_ref[...]) << jnp.uint32(8)) | _u32(qhi_ref[...])
    valid = valid_ref[...] != 0

    # RC word on (hi32, lo32) lanes: rc_hi = rev2(~lo), rc_lo = rev2(~hi)
    rc_hi32 = _rev2_32_u(~lo_u)
    rc_lo = _rev2_32_u(~fwd_hi32)
    fwd_le = (fwd_hi32 < rc_hi32) | ((fwd_hi32 == rc_hi32) & (lo_u <= rc_lo))
    c_hi32 = jnp.where(fwd_le, fwd_hi32, rc_hi32)
    c_lo = jnp.where(fwd_le, lo_u, rc_lo)

    h1 = _mix_u(c_hi32, c_lo)
    hb = _mix_u(c_hi32, c_lo ^ jnp.uint32(0x6A09E667))
    g = h1 ^ ((hb << jnp.uint32(15)) | (hb >> jnp.uint32(17)))
    bkt1 = jnp.where(valid, _i32(g & jnp.uint32(b1 - 1)), 0)
    h2 = _mix_u(c_hi32, c_lo ^ jnp.uint32(0x5BD1E995))
    bkt2 = jnp.where(valid, _i32(h2 & jnp.uint32(b2 - 1)), 0)

    bkt1_ref[...] = bkt1
    bkt2_ref[...] = bkt2
    keylo_ref[...] = _i32(c_lo)
    keyhi_ref[...] = _i32(c_hi32)
    flags_ref[...] = valid.astype(jnp.int32) | (fwd_le.astype(jnp.int32) << 1)


def pregather_canonical(qpre, qhi, qlo, valid, *, b1: int, b2: int,
                        tile: int = 256, interpret: bool | None = None):
    """(B, W) int32 lanes -> (bkt1, bkt2, key_lo, key_hi, flags), W padded to
    a lane multiple by the caller."""
    if interpret is None:
        interpret = _interpret_default()
    b, w = qpre.shape
    tile = min(tile, b)
    grid = (pl.cdiv(b, tile),)
    spec = pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pregather_kernel, b1=b1, b2=b2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((b, w), jnp.int32)] * 5,
        interpret=interpret,
    )(qpre, qhi, _i32(qlo.astype(jnp.uint32)), valid.astype(jnp.int32))
    return out


def _postgather_kernel(rows1_ref, rows2_ref, keylo_ref, keyhi_ref, flags_ref,
                       out_ref, *, slots: int, slots2: int, num_labels: int,
                       cap: int, do_rc: bool, use_t2: bool):
    """Slot compares + exact compact_histogram, fused in VMEM.

    rows1 (T, slots*3, W), rows2 (T, slots2*3, W): gathered bucket rows,
    slot-major (XLA transposes the gather output once).  Output (T, cap+1)
    u16-packed exactly like lookup.search_step_hist_packed."""
    big = jnp.int32(_BIG)
    keylo = keylo_ref[...]
    keyhi = keyhi_ref[...]
    flags = flags_ref[...]
    valid = (flags & 1) != 0

    val = jnp.zeros_like(keylo)
    for s in range(slots):
        r0 = rows1_ref[:, s * 3, :]
        r1 = rows1_ref[:, s * 3 + 1, :]
        r2 = rows1_ref[:, s * 3 + 2, :]
        m = (r0 == keylo) & (r1 == keyhi) & (r2 != 0)
        val = jnp.where(m, r2, val)
    if use_t2:
        miss1 = val == 0
        for s in range(slots2):
            r0 = rows2_ref[:, s * 3, :]
            r1 = rows2_ref[:, s * 3 + 1, :]
            r2 = rows2_ref[:, s * 3 + 2, :]
            m = miss1 & (r0 == keylo) & (r1 == keyhi) & (r2 != 0)
            val = jnp.where(m, r2, val)

    vu = _u32(val)
    va = _i32(vu & jnp.uint32(0xFFFF)) - 1
    vb = _i32(vu >> jnp.uint32(16)) - 1
    # windows beyond the true width (lane padding) carry valid=0 -> miss
    if do_rc:
        ka = jnp.where(valid & (va >= 0) & (va < num_labels), va, big)
        kb = jnp.where(valid & (vb >= 0) & (vb < num_labels), vb, big)
        key = jnp.concatenate([ka, kb], axis=1)
    else:
        fwd_le = (flags & 2) != 0
        fwd = jnp.where(fwd_le, va, vb)
        key = jnp.where(valid & (fwd >= 0) & (fwd < num_labels), fwd, big)

    t = key.shape[0]
    found = jnp.sum((key < big).astype(jnp.int32), axis=1)
    cur = jnp.full((t, 1), -1, jnp.int32)
    used = jnp.zeros((t,), jnp.int32)
    for s in range(cap):
        cand = jnp.where(key > cur, key, big)
        m = jnp.min(cand, axis=1, keepdims=True)
        hit = m[:, 0] < big
        cnt = jnp.sum((key == m).astype(jnp.int32), axis=1)
        lc = jnp.where(hit, (m[:, 0] + 1) | (cnt << 16), 0)
        out_ref[:, s] = lc
        used = used + hit.astype(jnp.int32)
        cur = m
    overflow = jnp.any(jnp.where(key > cur, key, big) < big, axis=1)
    nuniq = jnp.where(overflow, cap + 1, used)
    out_ref[:, cap] = nuniq | (found << 5)


def postgather_hist(rows1, rows2, keylo, keyhi, flags, *, slots: int,
                    slots2: int, num_labels: int, cap: int, do_rc: bool,
                    tile: int = 128, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret_default()
    b, w = keylo.shape
    tile = min(tile, b)
    use_t2 = rows2 is not None
    grid = (pl.cdiv(b, tile),)
    lane_spec = pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    r1_spec = pl.BlockSpec((tile, slots * 3, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if use_t2:
        r2_spec = pl.BlockSpec((tile, slots2 * 3, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        inputs = (rows1, rows2, keylo, keyhi, flags)
        in_specs = [r1_spec, r2_spec, lane_spec, lane_spec, lane_spec]
    else:
        # no spill table: bind a dummy (1,1,w) ref the kernel never reads
        rows2 = jnp.zeros((b, 1, w), jnp.int32)
        r2_spec = pl.BlockSpec((tile, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        inputs = (rows1, rows2, keylo, keyhi, flags)
        in_specs = [r1_spec, r2_spec, lane_spec, lane_spec, lane_spec]
    kernel = functools.partial(
        _postgather_kernel, slots=slots, slots2=slots2, num_labels=num_labels,
        cap=cap, do_rc=do_rc, use_t2=use_t2,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, cap + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cap + 1), jnp.int32),
        interpret=interpret,
    )(*inputs)


def _hist_kernel(ix_ref, out_ref, *, num_labels: int, cap: int):
    """Exact compact_histogram (lookup.py) on one VMEM tile, u16-packed
    output.  Replaces cap sequential (B, W) HBM re-read rounds with one read."""
    big = jnp.int32(_BIG)
    ix = ix_ref[...]
    key = jnp.where(ix < num_labels, ix, big)
    t = key.shape[0]
    found = jnp.sum((key < big).astype(jnp.int32), axis=1)
    cur = jnp.full((t, 1), -1, jnp.int32)
    used = jnp.zeros((t,), jnp.int32)
    for s in range(cap):
        cand = jnp.where(key > cur, key, big)
        m = jnp.min(cand, axis=1, keepdims=True)
        hit = m[:, 0] < big
        cnt = jnp.sum((key == m).astype(jnp.int32), axis=1)
        out_ref[:, s] = jnp.where(hit, (m[:, 0] + 1) | (cnt << 16), 0)
        used = used + hit.astype(jnp.int32)
        cur = m
    overflow = jnp.any(jnp.where(key > cur, key, big) < big, axis=1)
    nuniq = jnp.where(overflow, cap + 1, used)
    out_ref[:, cap] = nuniq | (found << 5)


def hist_packed_from_ix(ix, *, num_labels: int, cap: int, tile: int = 256,
                        interpret: bool | None = None):
    """(B, W) per-window label ids (miss >= num_labels) -> (B, cap+1) int32
    u16-packed histograms, bit-identical to search_step_hist_packed's tail."""
    if interpret is None:
        interpret = _interpret_default()
    b, w = ix.shape
    if w % 128:
        # pad windows with misses so tiles are full lanes
        ix = jnp.pad(ix, [(0, 0), (0, 128 - w % 128)], constant_values=num_labels)
        w = ix.shape[1]
    tile = min(tile, b)
    return pl.pallas_call(
        functools.partial(_hist_kernel, num_labels=num_labels, cap=cap),
        grid=(pl.cdiv(b, tile),),
        in_specs=[pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, cap + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cap + 1), jnp.int32),
        interpret=interpret,
    )(ix)


def search_step_hist_packed_plhist(table: dict, packed: jax.Array,
                                   vbits: jax.Array, lengths: jax.Array, *,
                                   k: int, do_rc: bool, probe_iters: int,
                                   bad_ix: int, num_labels: int, cap: int = 16,
                                   interpret: bool | None = None):
    """XLA lookup (gathers + compares stay fused as XLA likes them) with only
    the histogram in Pallas.  Bit-identical to search_step_hist_packed."""
    from utree_tpu.hash_index import CANON_SLOTS, CANON_SLOTS2
    from utree_tpu.lookup import (base_codes_packed, extract_windows,
                                  lookup_kmers_canonical, lookup_kmers,
                                  lookup_kmers_hash, rc_word_lanes)

    codes = base_codes_packed(packed, vbits, lengths)
    qpre, qhi, qlo, valid = extract_windows(codes, k)
    if "c1" in table:
        r = lookup_kmers_canonical(table, qpre, qhi, qlo, valid,
                                   slots=CANON_SLOTS, slots2=CANON_SLOTS2,
                                   bad_ix=bad_ix, do_rc=do_rc)
        ix = jnp.concatenate(r, axis=1) if do_rc else r
    else:
        if do_rc:
            rpre, rhi, rlo = rc_word_lanes(qpre, qhi, qlo)
            qpre = jnp.concatenate([qpre, rpre], axis=1)
            qhi = jnp.concatenate([qhi, rhi], axis=1)
            qlo = jnp.concatenate([qlo, rlo], axis=1)
            valid = jnp.concatenate([valid, valid], axis=1)
        if "t1" in table:
            ix = lookup_kmers_hash(table, qpre, qhi, qlo, valid, slots=8, bad_ix=bad_ix)
        else:
            ix = lookup_kmers(table, qpre, qhi, qlo, valid, probe_iters, bad_ix)
    return hist_packed_from_ix(ix, num_labels=num_labels, cap=cap,
                               interpret=interpret)


def search_step_hist_packed_fused(table: dict, packed: jax.Array,
                                  vbits: jax.Array, lengths: jax.Array, *,
                                  k: int, do_rc: bool, probe_iters: int,
                                  bad_ix: int, num_labels: int, cap: int = 16,
                                  interpret: bool | None = None):
    """Drop-in twin of lookup.search_step_hist_packed for the canonical path:
    Pallas pre-gather -> XLA t1/t2 gathers -> Pallas fused histogram.
    Output array is bit-identical."""
    from utree_tpu.hash_index import CANON_SLOTS, CANON_SLOTS2
    from utree_tpu.lookup import base_codes_packed, extract_windows

    if k != 32 or "c1" not in table:
        raise ValueError("fused step implements the k=32 canonical path")
    t1, t2 = table["c1"], table["c2"]
    b1, b2 = t1.shape[0], t2.shape[0]
    if t1.shape[1] != CANON_SLOTS * 3 or t2.shape[1] != CANON_SLOTS2 * 3:
        raise ValueError("slot count does not match table geometry")

    codes = base_codes_packed(packed, vbits, lengths)
    qpre, qhi, qlo, valid = extract_windows(codes, k)
    b, w = qpre.shape
    wp = -(-w // 128) * 128  # pad windows to full lanes; pad lanes are invalid
    pad = [(0, 0), (0, wp - w)]
    qpre = jnp.pad(qpre, pad)
    qhi = jnp.pad(qhi, pad)
    qlo = jnp.pad(qlo, pad)
    valid = jnp.pad(valid, pad)

    bkt1, bkt2, keylo, keyhi, flags = pregather_canonical(
        qpre, qhi, qlo, valid, b1=b1, b2=b2, interpret=interpret)

    # gathers stay XLA (at device random-access speed); transpose row minor
    # dim onto sublanes so the kernel reads slot-major (T, S*3, W) tiles
    rows1 = jnp.moveaxis(t1[bkt1], 2, 1)
    rows2 = jnp.moveaxis(t2[bkt2], 2, 1) if b2 > 8 else None

    return postgather_hist(
        rows1, rows2, keylo, keyhi, flags, slots=CANON_SLOTS,
        slots2=CANON_SLOTS2, num_labels=num_labels, cap=cap, do_rc=do_rc,
        interpret=interpret)
