"""Per-read classification: the "optimal aufbau" interpolated-taxonomy vote.

Host-exact replay of the reference searchGG vote (itree.c:1028-1098).  The
walk is string logic with several quirky boundary rules (blank-rank '_'
promotion, prefix promotion, cutoff re-bumps), so this module mirrors the C
statement-for-statement; golden tests compare its output byte-for-byte with
the reference binary.  The device pipeline computes the per-read hit label
HISTOGRAM (the only input the vote needs besides strings); this module turns
histograms into output lines.

Also implements the rank-specific ("shallow") vote of the non-GG search
(itree.c:969-1007) for capability parity.
"""

from __future__ import annotations

import numpy as np

U32 = 0xFFFFFFFF


def _u32(x: int) -> int:
    return x & U32


def aufbau_vote(
    name: bytes,
    hit_ixs: list[int] | np.ndarray,
    strings: list[bytes],
    taxacut: int = 4,
) -> bytes | None:
    """One read's output line (without trailing newline), or None if no hits.

    `hit_ixs` is the multiset of hit label ids in any order (the reference's
    result depends only on the multiset: Tax_Cnt is re-sorted by label string
    before the walk, itree.c:1041).  `name` is the query name already cut at
    the first space (itree.c:881-882).
    """
    found_uniq = len(hit_ixs)
    if found_uniq == 0:
        return None
    if found_uniq == 1:
        return name + b"\t" + strings[int(hit_ixs[0])] + b"\t1\t1\t*"
    counts = np.bincount(np.asarray(hit_ixs, dtype=np.int64))
    nz = np.flatnonzero(counts)
    if len(nz) == 1:
        return name + b"\t" + strings[int(hit_ixs[0])] + b"\t" + str(found_uniq).encode() + b"\t1\t*"
    # Tax_Cnt sorted by label string (byStr/qsort, itree.c:1041)
    tax_cnt = sorted(((strings[int(i)], int(counts[i])) for i in nz), key=lambda t: t[0])
    uix = len(tax_cnt)
    toprint, sl, ol = _aufbau_walk(tax_cnt, found_uniq, taxacut)
    return (
        name + b"\t" + toprint + b"\t" + str(found_uniq).encode() + b"\t"
        + str(uix).encode() + b"\t" + str(sl).encode() + b";" + str(ol).encode()
    )


def _cstr(s: bytes, i: int) -> int:
    """C-string byte access with terminator semantics: s[len] == 0."""
    return s[i] if i < len(s) else 0


def _aufbau_walk(tax_cnt: list[tuple[bytes, int]], found_uniq: int, taxacut: int):
    """The level-descent loop, itree.c:1044-1096.  All counters are uint32 in
    the reference; dv uses the wrapped values -1 -> 0xFFFFFFFF, -2 -> 0xFFFFFFFE.
    Returns (toPrint, sl, ol)."""
    dv_m1 = U32  # (uint32_t)-1
    dv_m2 = U32 - 1  # (uint32_t)-2
    uix = len(tax_cnt)
    cutoff = found_uniq - found_uniq // taxacut
    cutoff += 1 if (found_uniq >> 1) >= cutoff else 0
    lv = 0
    st, ed = 0, uix
    dv = dv_m1
    orun = found_uniq
    sl = ol = 0
    while True:
        run = tax_cnt[st][1]
        td = dv
        for z in range(st + 1, ed):
            s1, _ = tax_cnt[z - 1]
            s2, _ = tax_cnt[z]
            # s1[dv + (dv==-1)] with uint32 wraparound: index 0 when dv==-1
            probe = 0 if dv == dv_m1 else dv
            if _cstr(s1, probe) == 0:
                # non-aufbau: prior entry exhausted at this depth — drop it
                run = tax_cnt[z][1]
                st = z
                orun = _u32(orun - tax_cnt[z - 1][1])
                cutoff = orun - orun // taxacut
                cutoff += 1 if (orun >> 1) >= cutoff else 0
                continue
            td = _u32(dv + 1)
            while _cstr(s1, td) and _cstr(s1, td) == _cstr(s2, td):
                if _cstr(s1, td) == 0x3B:  # ';'
                    break
                td += 1
            if _cstr(s1, td) == _cstr(s2, td):
                run += tax_cnt[z][1]
            elif (_cstr(s1, td) == 0 and _cstr(s2, td) == 0x3B) or (
                (_cstr(s1, td) == 0x3B or _cstr(s1, td) == 0)
                and td >= 1
                and _cstr(s1, td - 1) == 0x5F  # '_'
            ):
                # aufbau promotion: s1 is a rank-prefix or blank-rank entry
                run = tax_cnt[z][1]
                st = z
                orun = _u32(orun - tax_cnt[z - 1][1])
                cutoff = orun - orun // taxacut
                cutoff += 1 if (orun >> 1) >= cutoff else 0
            elif run >= cutoff:
                ed = z
                break
            else:
                run = tax_cnt[z][1]
                st = z
        sl, ol = run, orun
        if run < cutoff:
            break
        if st + 1 >= ed:
            if tax_cnt[ed - 1][1] >= cutoff:
                dv = dv_m2
            break
        if _cstr(tax_cnt[ed - 1][0], td) == 0 or _cstr(tax_cnt[ed - 1][0], td) == 0x3B:
            lv += 1
            sl, ol = run, orun
        orun = run
        dv = td
        cutoff = run - run // taxacut
        cutoff += 1 if (run >> 1) >= cutoff else 0

    if dv == dv_m1:
        toprint = b""
    elif dv == dv_m2:
        toprint = tax_cnt[ed - 1][0]
    else:
        toprint = tax_cnt[ed - 1][0][:dv]
    return toprint, sl, ol


def shallow_vote(
    name: bytes,
    hit_ixs: list[int],
    strings: list[bytes],
    tolerance: int = 2,
    slack: int = 2,
) -> bytes | None:
    """Rank-specific (non-GG) vote, itree.c:980-1003.  `hit_ixs` must already
    be the SPARSITY-subsampled hits in scan order (itree.c:948-951)."""
    if not hit_ixs:
        return None
    kings_men = len(hit_ixs)
    if kings_men == 1:
        return name + b"\t" + strings[hit_ixs[0]]
    counts: dict[int, int] = {}
    for ix in hit_ixs:
        counts[ix] = counts.get(ix, 0) + 1
    most = second = 0
    most_ix = None
    for ix in hit_ixs:  # scan order determines tie resolution, as in C
        c = counts[ix]
        if c > most:
            second = most
            most_ix = ix
            most = c
        elif c > second:
            second = c
        counts[ix] = 0
        counts[ix] = c  # C zeroes Hashes as it goes; emulate single-pass max
    # Re-emulate exactly: the C loop zeroes each hash after reading, so later
    # duplicates of the same ix read 0.  Do that literally:
    counts = {}
    for ix in hit_ixs:
        counts[ix] = counts.get(ix, 0) + 1
    seen: dict[int, int] = dict(counts)
    most = second = 0
    most_ix = None
    for ix in hit_ixs:
        c = seen.get(ix, 0)
        if c > most:
            second = most
            most_ix = ix
            most = c
        elif c > second:
            second = c
        seen[ix] = 0
    if most < tolerance or most < slack * second:
        return None
    conf = 1.0 - second / most
    return name + b"\t" + strings[most_ix] + b"\t" + (b"%f" % conf) + b"\t" + str(most).encode()
