"""Property tests: the device aufbau walk (classify_device) must reproduce
classify._aufbau_walk — the host oracle that is itself golden-tested against
the reference binary — on adversarial random taxonomies."""

import numpy as np
import pytest

from utree_tpu.classify import _aufbau_walk
from utree_tpu.classify_device import (DV_EMPTY, DV_FULL, DV_INTERP,
                                       AufbauTables, aufbau_walk_device,
                                       build_aufbau_tables)


def _random_strings(rng, n):
    """Taxonomy-shaped strings with shared prefixes, blank ranks, '_' tails,
    and the occasional pathological flat string."""
    ranks = [b"k__", b"p__", b"c__", b"o__", b"f__", b"g__", b"s__"]
    words = [b"a", b"ab", b"abc", b"b", b"ba", b"x", b"", b"_", b"q_"]
    out = set()
    while len(out) < n:
        kind = rng.random()
        if kind < 0.85:
            depth = int(rng.integers(1, len(ranks) + 1))
            parts = []
            for d in range(depth):
                w = words[int(rng.integers(len(words)))]
                parts.append(ranks[d] + w)
            out.add(b";".join(parts))
        elif kind < 0.95:  # flat strings, no semicolons
            ln = int(rng.integers(1, 6))
            out.add(bytes(rng.choice(list(b"ab_;"), ln).astype(np.uint8)))
        else:
            out.add(b"")
    return sorted(out)[:n]


def _expected(strings, uniq, cnts, taxacut=4):
    tax_cnt = sorted(((strings[i], int(c)) for i, c in zip(uniq, cnts)),
                     key=lambda t: t[0])
    found = int(np.sum(cnts))
    toprint, sl, ol, _ = _aufbau_walk(tax_cnt, found, taxacut)
    return toprint, sl, ol


def _device(strings, batch_uniq, batch_cnts, cap, taxacut=4):
    import jax

    tab = build_aufbau_tables(strings)
    dtab = tab.device_put()
    B = len(batch_uniq)
    labels = np.full((B, cap), -1, np.int32)
    counts = np.zeros((B, cap), np.int32)
    nuniq = np.zeros(B, np.int32)
    found = np.zeros(B, np.int32)
    for b, (u, c) in enumerate(zip(batch_uniq, batch_cnts)):
        labels[b, : len(u)] = u
        counts[b, : len(u)] = c
        nuniq[b] = len(u)
        found[b] = int(np.sum(c))
    max_iters = (tab.max_len + 4) * (cap + 2) + 16
    rep, dvcode, dv, sl, ol, flag = jax.jit(
        lambda t, l, c, n, f: aufbau_walk_device(
            t, l, c, n, f, taxacut=taxacut, max_iters=max_iters)
    )(dtab, labels, counts, nuniq, found)
    return (np.asarray(rep), np.asarray(dvcode), np.asarray(dv),
            np.asarray(sl), np.asarray(ol), np.asarray(flag))


def _toprint(strings, rep, dvcode, dv):
    if dvcode == DV_EMPTY:
        return b""
    if dvcode == DV_FULL:
        return strings[rep]
    return strings[rep][:dv]


@pytest.mark.parametrize("seed,cap,taxacut", [
    (0, 8, 4), (1, 8, 4), (2, 8, 4), (3, 8, 4),
    (4, 4, 4), (5, 12, 4), (6, 8, 2), (7, 8, 8),
])
def test_device_walk_matches_host_oracle(seed, cap, taxacut):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(8, 80))
    strings = _random_strings(rng, L)
    batch_u, batch_c = [], []
    for _ in range(300):
        k = int(rng.integers(2, cap + 1))
        u = rng.choice(L, size=min(k, L), replace=False)
        u.sort()
        c = rng.integers(1, 12, size=len(u))
        batch_u.append(u.astype(np.int64))
        batch_c.append(c.astype(np.int64))
    rep, dvcode, dv, sl, ol, flag = _device(strings, batch_u, batch_c, cap,
                                            taxacut=taxacut)
    assert not flag.any()
    for b, (u, c) in enumerate(zip(batch_u, batch_c)):
        want_tp, want_sl, want_ol = _expected(strings, u, c, taxacut)
        got_tp = _toprint(strings, int(rep[b]), int(dvcode[b]), int(dv[b]))
        assert got_tp == want_tp, (b, strings, u.tolist(), c.tolist(),
                                   got_tp, want_tp)
        assert (int(sl[b]), int(ol[b])) == (want_sl, want_ol), (
            b, strings, u.tolist(), c.tolist())


def test_device_walk_trivial_and_overflow():
    rng = np.random.default_rng(9)
    strings = _random_strings(rng, 20)
    cap = 4
    batch_u = [np.array([3]), np.array([5]),
               np.array([0, 1, 2, 3, 4])[:5]]  # 5 uniques > cap
    batch_c = [np.array([7]), np.array([1]), np.ones(5, np.int64)]
    # overflow read: only cap entries fit; nuniq reports cap+1
    labels = np.full((3, cap), -1, np.int32)
    counts = np.zeros((3, cap), np.int32)
    import jax

    tab = build_aufbau_tables(strings)
    dtab = tab.device_put()
    for b, (u, c) in enumerate(zip(batch_u, batch_c)):
        labels[b, :min(len(u), cap)] = u[:cap]
        counts[b, :min(len(u), cap)] = c[:cap]
    nuniq = np.array([1, 1, cap + 1], np.int32)
    found = np.array([7, 1, 5], np.int32)
    rep, dvcode, dv, sl, ol, flag = jax.jit(
        lambda t, l, c, n, f: aufbau_walk_device(
            t, l, c, n, f, taxacut=4, max_iters=256)
    )(dtab, labels, counts, nuniq, found)
    rep, dvcode, flag = np.asarray(rep), np.asarray(dvcode), np.asarray(flag)
    assert rep[0] == 3 and dvcode[0] == DV_FULL and flag[0] == 0
    assert rep[1] == 5 and dvcode[1] == DV_FULL and flag[1] == 0
    assert flag[2] == 1  # host must replay
