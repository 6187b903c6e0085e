"""XTree ALIGN (xtree.c:721-1644) — host-exact implementation.

The hot k-mer matching is vectorized NumPy (and later runs on device; the
geometry — 26-bit prefix bins + u32 suffix exact-match — is the same shape as
the utree CTR lookup).  The per-query voting, LCA interpolation, capitalist
redistribution, and the five writers replay the reference literally,
including its observable quirks:

- LBS_k reads one pod past the bin (xtree.c:177): for the last bin that byte
  range is the stringSz field — we append that sentinel pod at load;
- the per-entry taxon dedupe uses the negative-mark trick (xtree.c:1211-1214);
- a query matched at full-string level with a single taxon (h_max2 == 0) sets
  finalT but leaves MasterBin.a[H+1] = -1, so it is absent from tax-out
  (xtree.c:1238-1240 vs 1300);
- redistribution skips the first blank taxonomy string and reassigns
  MasterBin wholesale (xtree.c:1344-1398).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from utree_tpu.encode import encode_bases
from utree_tpu.xtree.build import XtreeDB


def binsearch_str_L(strings: list[bytes], key: bytes, key_len: int) -> int:
    """Literal replay of xtree.c:122-141 (length-limited prefix search)."""
    lo, hi = 0, len(strings)
    while lo < hi:
        mid = lo + ((hi - lo) >> 1)
        ref = strings[mid]
        i = 0
        while i < key_len and i < len(ref):
            if key[i] != ref[i]:
                break
            i += 1
        if i == key_len and i < len(ref):
            cmp = -1
        else:
            kc = key[i] if i < len(key) else 0
            rc = ref[i] if i < len(ref) else 0
            cmp = kc - rc
        if cmp > 0:
            lo = mid + 1
        elif cmp < 0:
            hi = mid
        else:
            return mid
    return lo


def build_lbins(strings: list[bytes]) -> list[np.ndarray]:
    """Per-level ancestor table (xtree.c:843-856): LBins[lv][i] = index of the
    first string strictly extending i's prefix up to its (lv+1)-th ';'."""
    levels: list[np.ndarray] = []
    n = len(strings)
    for i, s in enumerate(strings):
        lv = 0
        pos = -1
        while True:
            pos = s.find(b";", pos + 1)
            if pos < 0:
                break
            find = binsearch_str_L(strings, s, pos)
            if lv >= len(levels):
                levels.append(np.full(n, -1, np.int64))
            levels[lv][i] = find
            lv += 1
    return levels


@dataclasses.dataclass
class AlignOptions:
    confidence: float = 0.33
    n_uniq_matches: int = 0
    do_full_lca: bool = True
    do_redist: bool = False
    do_fast_redist: bool = False
    perq_out: str | None = None
    ref_out: str | None = None
    tax_out: str | None = None
    cov_out: str | None = None
    orthog_out: str | None = None


class XtreeAligner:
    def __init__(self, db: XtreeDB):
        self.db = db
        self.k = db.pl + db.sl
        self.pl = db.pl
        self.sl = db.sl
        n = db.num_kmers
        # sentinel pod past the end: LBS_k may read KGrid[numK], whose bytes
        # in the mmap'd file are the u64 ref-string-pool size (xtree.c:177)
        pool_sz = sum(len(x) + 1 for x in db.ref_names)
        self.sfx = np.concatenate([db.sfx.astype(np.int64), [pool_sz & 0xFFFFFFFF]])
        self.rix = np.concatenate([db.rix.astype(np.int64), [pool_sz >> 32]])
        self.bins = db.bin_offsets.astype(np.int64)
        # run_end[j]: end of the equal-suffix run containing pod j, within its bin
        bin_of = np.searchsorted(self.bins, np.arange(n), side="right") - 1
        brk = np.ones(n + 1, bool)
        if n > 1:
            brk[1:n] = (self.sfx[1:n] != self.sfx[: n - 1]) | (bin_of[1:] != bin_of[:-1])
        ends = np.flatnonzero(brk)
        self.run_end = np.repeat(ends[1:], np.diff(ends))
        self.h_strings = db.h_strings
        self.h_pairs = db.h_pairs
        self.n_uniq_h = (len(db.h_strings[0]), len(db.h_strings[1]))
        self.lbins = (
            build_lbins(db.h_strings[0]) if db.h_strings[0] else [],
            build_lbins(db.h_strings[1]) if db.h_strings[1] else [],
        )

    # ---- k-mer matching (vectorized; both strands at every valid window) ----

    def query_hits(self, seq: bytes):
        """All (prefix_bin, seed_pod) pairs in scan order: per position,
        forward then RC (xtree.c:1024-1081).  Misses skipped."""
        codes = encode_bases(seq).astype(np.int64)
        n = len(codes)
        k, pl, sl = self.k, self.pl, self.sl
        if n < k:
            return np.zeros(0, np.int64), np.zeros(0, np.int64), 0
        valid = codes <= 3
        inv = np.concatenate(([0], np.cumsum(~valid).astype(np.int64)))
        xs = np.arange(0, n - k + 1)
        ok = (inv[xs + k] - inv[xs]) == 0
        xs = xs[ok]
        if len(xs) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64), 0
        cc = np.where(valid, codes, 0)
        rc = 3 - cc
        pre_f = np.zeros(len(xs), np.int64)
        for j in range(pl):
            pre_f = (pre_f << 2) | cc[xs + j]
        suf_f = np.zeros(len(xs), np.int64)
        for j in range(pl, k):
            suf_f = (suf_f << 2) | cc[xs + j]
        # RC: prefix = revcomp of last PL bases; suffix = revcomp of first SL
        pre_r = np.zeros(len(xs), np.int64)
        for j in range(k - 1, sl - 1, -1):
            pre_r = (pre_r << 2) | rc[xs + j]
        suf_r = np.zeros(len(xs), np.int64)
        for j in range(sl - 1, -1, -1):
            suf_r = (suf_r << 2) | rc[xs + j]

        seeds_f = self._lookup(pre_f, suf_f)
        seeds_r = self._lookup(pre_r, suf_r)
        # interleave in scan order: fwd(x) then rc(x)
        pre_all = np.stack([pre_f, pre_r], axis=1).reshape(-1)
        seed_all = np.stack([seeds_f, seeds_r], axis=1).reshape(-1)
        hit = seed_all >= 0
        return pre_all[hit], seed_all[hit], len(xs)

    def _lookup(self, pre: np.ndarray, suf: np.ndarray) -> np.ndarray:
        """LBS_k lower bound per bin (xtree.c:170-178); -1 = miss."""
        lo = self.bins[pre]
        hi = self.bins[pre + 1]
        empty = lo >= hi
        l, r = lo.copy(), hi.copy()
        while (l < r).any():
            m = (l + r) >> 1
            go = l < r
            lt = self.sfx[np.minimum(m, len(self.sfx) - 1)] < suf
            l = np.where(go & lt, m + 1, l)
            r = np.where(go & ~lt, m, r)
        # the C checks KP[L] even when L == bin size (reads next bin/sentinel)
        found = (~empty) & (self.sfx[np.minimum(l, len(self.sfx) - 1)] == suf)
        return np.where(found, l, -1)

    # ---- per-query voting -------------------------------------------------

    def _ref_tally(self, seeds: np.ndarray):
        """Distinct-ref counts per query (xtree.c:1104-1120): per SBin entry,
        expand the equal-suffix run, counting each ref once per CONSECUTIVE
        occurrence (in-ref copies dedupe via prev_rix)."""
        rbin: dict[int, int] = {}
        for s in seeds:
            prev = -1
            for j in range(s, self.run_end[s]):
                rx = int(self.rix[j])
                if rx == prev:
                    continue
                rbin[rx] = rbin.get(rx, 0) + 1
                prev = rx
        return rbin

    @staticmethod
    def _max2(rbin: dict[int, int]):
        """max/max2 with the smaller-rix tie-break (xtree.c:1131-1138).
        maxRix starts at (rix_t)-1, so the tie compare is unsigned with
        UINT_MAX as the initial value."""
        mx = mx2 = 0
        mix = 0xFFFFFFFF
        for rx, c in rbin.items():
            if c > mx or (c == mx and rx < mix):
                mx2, mx, mix = mx, c, rx
            elif c > mx2:
                mx2 = c
        return mx, mx2, (-1 if mix == 0xFFFFFFFF else mix)

    def _h_tally(self, seeds: np.ndarray, hmap: np.ndarray):
        """Per-entry-deduped taxon counts (the sign trick, xtree.c:1200-1215):
        each SBin entry contributes at most 1 to each taxon."""
        hbin: dict[int, int] = {}
        for s in seeds:
            seen = set()
            for j in range(s, self.run_end[s]):
                h = int(hmap[int(self.rix[j])])
                if h not in seen:
                    seen.add(h)
                    hbin[h] = hbin.get(h, 0) + 1
        return hbin

    def _h_tally_lbins(self, seeds: np.ndarray, hmap: np.ndarray, lbin: np.ndarray):
        hbin: dict[int, int] = {}
        for s in seeds:
            seen = set()
            for j in range(s, self.run_end[s]):
                h = int(hmap[int(self.rix[j])])
                f = int(lbin[h])
                if f == -1:
                    continue
                if f not in seen:
                    seen.add(f)
                    hbin[f] = hbin.get(f, 0) + 1
        return hbin

    @staticmethod
    def _h_max2(hbin: dict[int, int]):
        """h_max tie-break (xtree.c:1221): `rix < h_maxIx1` where h_maxIx1 is
        int32 -1 but rix is uint32 — usual conversions make the compare
        unsigned, so -1 acts as UINT_MAX and the first candidate wins."""
        mx = mx2 = 0
        mix = 0xFFFFFFFF
        for h, c in hbin.items():
            if c > mx or (c == mx and h < mix):
                mx2 = mx
                mx, mix = c, h
            elif c > mx2:
                mx2 = c
        return mx, mx2, (-1 if mix == 0xFFFFFFFF else mix)

    # ---- main driver --------------------------------------------------------

    def align_file(self, reads_path: str, opts: AlignOptions):
        from utree_tpu.xtree.io import iter_queries

        db = self.db
        nuh = self.n_uniq_h
        results = []  # MasterBin rows: [rix, h1, h2]
        cbins = ([], [], [])  # candidate lists per hierarchy (redistribution)
        perq_lines = [] if opts.perq_out else None
        query_aligns = np.zeros(db.num_kmers + 1, np.int64)  # QueryAligns
        full_query_aligns = np.zeros(db.num_refs, np.int64)  # FullQueryAligns
        n_queries = 0

        for qhed, seq in iter_queries(reads_path):
            n_queries += 1
            pres, seeds, _nw = self.query_hits(seq)
            tix = len(seeds)
            mb = [-1, -1, -1]
            cand = ([], [], [])
            if tix == 0:
                if perq_lines is not None:
                    perq_lines.append(qhed + b"\tNo matches found")
                results.append(mb)
                for j in range(3):
                    cbins[j].append(cand[j])
                continue

            rbin = self._ref_tally(seeds)
            mx, mx2, mix = self._max2(rbin)
            if not rbin or mix == -1 or mx < opts.n_uniq_matches:
                if perq_lines is not None:
                    perq_lines.append(qhed + b"\tNo matches found")
                results.append(mb)
                for j in range(3):
                    cbins[j].append(cand[j])
                continue

            if opts.cov_out:
                for s in seeds:
                    for j in range(s, self.run_end[s]):
                        if rbin.get(int(self.rix[j]), 0) == mx:
                            query_aligns[s] += 1  # seed, not j (xtree.c:1158)
                for rx, c in rbin.items():
                    if c == mx:
                        full_query_aligns[rx] += 1
            if opts.do_redist:
                cand[0].extend(rx for rx, c in rbin.items() if c == mx)

            mb[0] = mix
            final_t = [b"", b""]
            final_l = [0xFFFF, 0xFFFF]
            if not mx2 or (mx > mx2 and mx / tix >= opts.confidence):
                # early call (xtree.c:1182-1195)
                for h in range(2):
                    if self.h_strings[h]:
                        final_t[h] = self.h_strings[h][int(self.h_pairs[h][mix])]
                if self.h_strings[0]:
                    if opts.tax_out:
                        mb[1] = int(self.h_pairs[0][mix])
                    if opts.do_redist:
                        cand[1].append(int(self.h_pairs[0][mix]))
                if self.h_strings[1]:
                    if opts.tax_out:
                        mb[2] = int(self.h_pairs[1][mix])
                    if opts.do_redist:
                        cand[2].append(int(self.h_pairs[1][mix]))
            else:
                for h in range(2):
                    if not self.h_strings[h]:
                        break
                    hbin = self._h_tally(seeds, self.h_pairs[h])
                    hmx, hmx2, hmix = self._h_max2(hbin)
                    if opts.do_redist:
                        cand[h + 1].extend(t for t, c in hbin.items() if c == hmx)
                    if not hmx2 or (not opts.do_full_lca and hmx > hmx2 and hmx / tix >= opts.confidence):
                        final_t[h] = self.h_strings[h][hmix]
                    else:
                        # full aufbau over LBins levels (xtree.c:1241-1301)
                        agreed = tix
                        ag_thres = int(opts.confidence * tix)
                        winner, win_lv = -1, -1
                        semi = 1
                        while agreed >= ag_thres:
                            if semi - 1 >= len(self.lbins[h]):
                                break
                            agreed = 0
                            lb = self._h_tally_lbins(seeds, self.h_pairs[h], self.lbins[h][semi - 1])
                            lmax = lmax2 = 0
                            lwin = 0
                            for t, c in lb.items():
                                if c >= ag_thres:
                                    if c > lmax:
                                        lmax2, lmax, lwin = lmax, c, t
                                    elif c > lmax2:
                                        lmax2 = c
                            if lmax > lmax2 and lmax >= ag_thres:
                                agreed, winner, win_lv = lmax, lwin, semi
                            semi += 1
                        if winner != -1:
                            if perq_lines is not None:
                                s = self.h_strings[h][winner]
                                p = -1
                                for _ in range(win_lv):
                                    p = s.find(b";", p + 1)
                                final_l[h] = p if p >= 0 else 0xFFFF
                                final_t[h] = s
                            if opts.tax_out:
                                mb[h + 1] = winner + win_lv * nuh[h]

            if perq_lines is not None:
                rn = db.ref_names[mix] if mix != -1 else b""
                t0 = final_t[0][: final_l[0]] if final_l[0] != 0xFFFF else final_t[0]
                t1 = final_t[1][: final_l[1]] if final_l[1] != 0xFFFF else final_t[1]
                perq_lines.append(
                    qhed + b"\t" + rn + b"\t[%d,%d]\t" % (mx, mx2) + t0 + b"\t" + t1
                    + b"\t%d" % tix
                )
            results.append(mb)
            for j in range(3):
                cbins[j].append(cand[j])

        master = np.array(results, np.int64) if results else np.zeros((0, 3), np.int64)
        if opts.do_redist:
            self._redistribute(master, cbins, opts)
        self._write_outputs(master, opts, perq_lines, query_aligns, full_query_aligns)
        return master

    # ---- capitalist redistribution (xtree.c:1321-1403) ----------------------

    def _redistribute(self, master: np.ndarray, cbins, opts: AlignOptions):
        nq = len(master)
        sizes = [self.db.num_refs if opts.ref_out else 0, self.n_uniq_h[0], self.n_uniq_h[1]]
        for i in range(3):
            if not sizes[i]:
                continue
            tally = np.zeros(sizes[i], np.int64)
            for q in range(nq):
                for c in cbins[i][q]:
                    tally[c] += 1
            first_ix = -1
            if i > 0:
                for j, s in enumerate(self.h_strings[i - 1]):
                    if not s:
                        first_ix = j
                        break
            changes = -1
            conv = nq // 100000
            max_pass = 1 if opts.do_fast_redist else 100
            p = 0
            while p < max_pass and (changes == -1 or changes > conv):
                next_tally = np.zeros(sizes[i], np.int64)
                for q in range(nq):
                    which = -1
                    mx = 0
                    for c in cbins[i][q]:
                        if tally[c] > mx and (c != first_ix or which == -1):
                            mx, which = tally[c], c
                    if which != -1:
                        next_tally[which] += 1
                changes = int(np.abs(tally - next_tally).sum())
                tally = next_tally
                p += 1
            for q in range(nq):
                which = -1
                mx = 0
                for c in cbins[i][q]:
                    if tally[c] > mx and (c != first_ix or which == -1):
                        mx, which = tally[c], c
                master[q, i] = which

    # ---- writers -------------------------------------------------------------

    def _write_outputs(self, master, opts: AlignOptions, perq_lines,
                       query_aligns, full_query_aligns):
        db = self.db
        if opts.perq_out and perq_lines is not None:
            with open(opts.perq_out, "wb") as fo:
                for ln in perq_lines:
                    fo.write(ln + b"\n")
        if opts.ref_out:
            tally = np.zeros(db.num_refs, np.int64)
            for r in master[:, 0]:
                if r != -1:
                    tally[r] += 1
            with open(opts.ref_out, "wb") as fo:
                for i in range(db.num_refs):
                    if tally[i]:
                        fo.write(db.ref_names[i] + b"\t%d\n" % tally[i])
        if opts.tax_out:
            self._write_tax(master, opts.tax_out)
        if opts.orthog_out:
            self._write_orthog(master, opts.orthog_out)
        if opts.cov_out:
            self._write_cov(opts.cov_out, query_aligns, full_query_aligns)

    def _write_tax(self, master, path):
        """Tax tally with interpolation decode (xtree.c:1421-1462)."""
        with open(path, "wb") as fo:
            for h in range(2):
                col = master[:, h + 1]
                vals = col[col != -1]
                if len(vals) == 0:
                    continue
                max_h = int(vals.max())
                if max_h == 0 and not len(vals):
                    continue
                tally = np.bincount(vals, minlength=max_h + 1)
                nuh = self.n_uniq_h[h]
                lv, next_lv = 0, nuh
                for i in range(max_h + 1):
                    if not tally[i]:
                        continue
                    while i >= next_lv:
                        next_lv += nuh
                        lv += 1
                    if not lv:
                        fo.write(self.h_strings[h][i] + b"\t%d\n" % tally[i])
                    else:
                        s = self.h_strings[h][i - (next_lv - nuh)]
                        semi = 0
                        pos = 0
                        while semi < lv and pos < len(s):
                            semi += s[pos] == 0x3B
                            pos += 1
                        fo.write(s[: pos - 1] + b"\t%d\n" % tally[i])

    def _write_orthog(self, master, path):
        """Orthogonal (H1,H2) cross-tab (xtree.c:1464-1535), replayed literally
        including the run-length commit quirk that drops/miscounts the last
        element of each hash bucket."""
        prime = 4969
        rows = [q for q in range(len(master)) if master[q, 0] != -1]
        buckets: dict[int, list[int]] = {}
        for q in rows:
            h1 = master[q, 1] & 0xFFFFFFFF
            h2 = master[q, 2] & 0xFFFFFFFF
            val = (h2 << 32) | h1
            buckets.setdefault(val % prime, []).append(val)
        with open(path, "wb") as fo:
            for hsh in range(prime):
                if hsh not in buckets:
                    continue
                vals = sorted(buckets[hsh])
                last = vals[0]
                tally = 0
                for i, val in enumerate(vals):
                    if val != last or i == len(vals) - 1:
                        commit = vals[i - 1]
                        h1 = commit & 0xFFFFFFFF
                        h2 = commit >> 32
                        self._orthog_line(fo, h1, h2, tally)
                        tally = 0
                    tally += 1
                    last = val

    def _orthog_line(self, fo, h1, h2, tally):
        nuh = self.n_uniq_h
        if h1 == 0xFFFFFFFF or h2 == 0xFFFFFFFF:
            return  # unreachable for matched queries with taxa set
        lv1, lv2 = h1 // nuh[0], h2 // nuh[1] if nuh[1] else 0
        s1 = self.h_strings[0][h1 % nuh[0]]
        s2 = self.h_strings[1][h2 % nuh[1]] if nuh[1] else b""
        l1 = self._semi_offset(s1, lv1)
        l2 = self._semi_offset(s2, lv2)
        fo.write(s1[:l1] + b"\t" + s2[:l2] + b"\t%d\n" % tally)

    @staticmethod
    def _semi_offset(s: bytes, lv: int) -> int:
        if not lv:
            return len(s)  # L = UINT16_MAX ?: full string via %.*s
        semi = 0
        pos = 0
        while semi < lv and pos < len(s):
            semi += s[pos] == 0x3B
            pos += 1
        return pos - 1

    def _write_cov(self, path, query_aligns, full_query_aligns):
        """Coverage table (xtree.c:1537-1640)."""
        db = self.db
        nr = db.num_refs
        tot_k = np.zeros(nr, np.int64)
        tot_uniq = np.zeros(nr, np.int64)
        found_k = np.zeros(nr, np.int64)
        found_uniq = np.zeros(nr, np.int64)
        prop_k = np.zeros(nr, np.int64)
        prop_uniq = np.zeros(nr, np.int64)
        bins = self.bins
        n = db.num_kmers
        # visit only nonempty bins (2^26 total, nearly all empty)
        nonempty = np.flatnonzero(np.diff(bins))
        for b in nonempty:
            lo, hi = int(bins[b]), int(bins[b + 1])
            j = lo
            while j < hi:
                # equal-suffix run
                e = j
                while e < hi and self.sfx[e] == self.sfx[j]:
                    e += 1
                mv = int(query_aligns[j:e].max())
                ambig = len(set(self.rix[j:e].tolist())) > 1
                jj = j
                while jj < e:
                    rr = int(self.rix[jj])
                    nd = 1
                    while jj + nd < e and self.rix[jj + nd] == rr:
                        nd += 1
                    if not ambig:
                        tot_uniq[rr] += nd
                        found_uniq[rr] += mv
                        prop_uniq[rr] += min(mv, nd)
                    tot_k[rr] += nd
                    found_k[rr] += mv
                    prop_k[rr] += min(mv, nd)
                    jj += nd
                j = e
        with open(path, "wb") as fo:
            fo.write(b"Reference\tKmers_found\t")
            fo.write(b"Unique_kmers_found\tKmers_covered\tUnique_kmers_covered\t")
            fo.write(b"Proportion_covered\tUnique_proportion_covered\tReads_covered\n")
            for i in range(nr):
                if not found_k[i]:
                    continue
                fo.write(db.ref_names[i] + b"\t%d\t%d\t%d\t%d" % (
                    found_k[i], found_uniq[i], prop_k[i], prop_uniq[i]))
                fo.write(b"\t%f\t%f\t%d\n" % (
                    prop_k[i] / tot_k[i] if tot_k[i] else 0.0,
                    prop_uniq[i] / tot_uniq[i] if tot_uniq[i] else 0.0,
                    full_query_aligns[i]))
