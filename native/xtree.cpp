// Native xtree ALIGN scan: rolling fwd+RC encode + per-bin lower-bound probe,
// emitting (prefix, seed) hit pairs per query in scan order (position
// ascending, forward before RC) — the data-parallel redesign of the
// reference's ALIGN hot loop (xtree.c:1024-1081), exactness-matched to
// utree_tpu/xtree/align.py:_batch_hits (the NumPy spec twin, itself golden-
// tested against the reference binary).
//
// Single pass: each query writes into its own pre-sized span
// [qoff[q], qoff[q] + 2*windows(q)) and reports how many hits it produced;
// the caller compacts (so OpenMP threads never contend on an output cursor).

#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// strict ACGT table (encode.py _CODE_TABLE / C2Xb, itree.c:110-121); the
// align query path treats every other byte as a window-invalidating base
int8_t CODE[256];
struct InitCode {
    InitCode() {
        for (int i = 0; i < 256; i++) CODE[i] = -1;
        CODE['A'] = CODE['a'] = 0;
        CODE['C'] = CODE['c'] = 1;
        CODE['G'] = CODE['g'] = 2;
        CODE['T'] = CODE['t'] = 3;
    }
} init_code;

// LBS_k lower bound within [lo, hi) + sentinel-tolerant hit test
// (align.py:_lookup; the C checks KP[L] even when L == bin end)
static inline int64_t probe(const int64_t* sfx, int64_t lo, int64_t hi,
                            int64_t suf) {
    if (lo >= hi) return -1;
    int64_t l = lo, r = hi;
    while (l < r) {
        int64_t m = (l + r) >> 1;
        if (sfx[m] < suf) l = m + 1; else r = m;
    }
    return sfx[l] == suf ? l : -1;
}

}  // namespace

extern "C" {

// Scan nq queries (byte pool + offsets) against the (bins, sfx) k-mer grid.
// k = pl + sl <= 29 (2-bit words fit u64).  For query q, hits are written at
// pre_out/seed_out[qoff[q] ..]; counts[q] reports how many.  sfx must carry
// the one-past sentinel pod (align.py:100-104), so probe() may read index
// bins[last].
void xt_scan_hits(int64_t nq, const uint8_t* pool, const int64_t* off,
                  int32_t k, int32_t pl,
                  const int64_t* bins, const int64_t* sfx,
                  const int64_t* qoff,
                  int64_t* pre_out, int64_t* seed_out, int64_t* counts) {
    const int32_t sl = k - pl;
    const uint64_t mask_k = (2 * k == 64) ? ~0ull : ((1ull << (2 * k)) - 1);
    const uint64_t mask_sl = (1ull << (2 * sl)) - 1;
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t q = 0; q < nq; q++) {
        const uint8_t* s = pool + off[q];
        const int64_t n = off[q + 1] - off[q];
        int64_t* pq = pre_out + qoff[q];
        int64_t* sq = seed_out + qoff[q];
        int64_t c = 0;
        if (n >= k) {
            uint64_t w = 0, r = 0;
            int64_t last_bad = -1;
            for (int64_t i = 0; i < n; i++) {
                const int8_t cd = CODE[s[i]];
                const uint64_t cc = cd < 0 ? 0 : (uint64_t)cd;
                if (cd < 0) last_bad = i;
                w = ((w << 2) | cc) & mask_k;
                r = (r >> 2) | ((3ull - cc) << (2 * (k - 1)));
                const int64_t x = i - k + 1;
                if (x < 0 || last_bad >= x) continue;
                const int64_t pre_f = (int64_t)(w >> (2 * sl));
                const int64_t pre_r = (int64_t)(r >> (2 * sl));
                int64_t sd = probe(sfx, bins[pre_f], bins[pre_f + 1],
                                   (int64_t)(w & mask_sl));
                if (sd >= 0) { pq[c] = pre_f; sq[c] = sd; c++; }
                sd = probe(sfx, bins[pre_r], bins[pre_r + 1],
                           (int64_t)(r & mask_sl));
                if (sd >= 0) { pq[c] = pre_r; sq[c] = sd; c++; }
            }
        }
        counts[q] = c;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Tally kernels: C++ twins of align.py:_batch_ref_tally / _batch_h_tally
// (expansion per xtree.c:1104-1120 with the probed-bin hardstop; per-run
// consecutive-rix dedupe; insertion-order keys = expanded-space flat index).
// Outputs are per-query spans at caller-provided upper-bound offsets; the
// caller compacts.  Scratch is epoch-stamped direct-index arrays so each
// (query, ref/taxon) op is O(1).
// ---------------------------------------------------------------------------

#include <algorithm>
#include <cstddef>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Per-query distinct-ref counts + max/max2/argmax.  Hits arrive qid-ascending
// (scan order); qstart[q]..qstart[q+1] bounds query q's hits; out arrays are
// written at qoff[q] (caller-computed upper bound >= distinct refs of q).
// Emits per query, sorted by ref id: out_r, out_c, out_first (expanded-space
// flat index of the ref's first kept occurrence — the dict-insertion key);
// nd[q] = number of distinct refs.  mx/mx2/mix per align.py:_group_minmax
// (mx2 = second-largest count WITH multiplicity; mix = min ref id among
// count == mx, -1 if the query has no entries).
void xt_ref_tally(const int64_t* qid, const int64_t* pre, const int64_t* seed,
                  const int64_t* bins, const int64_t* run_end_ext,
                  const int64_t* rix,
                  int64_t Q, int64_t R,
                  const int64_t* qstart, const int64_t* qoff,
                  int64_t* mx, int64_t* mx2, int64_t* mixv,
                  int64_t* out_r, int64_t* out_c, int64_t* out_first,
                  int64_t* nd) {
    // expanded-space flat offset of each hit's run start (global across the
    // chunk, matching numpy's kidx over np.repeat order)
    std::vector<int64_t> ebase(qstart[Q] + 1, 0);
    for (int64_t i = 0; i < qstart[Q]; i++) {
        int64_t L = run_end_ext[seed[i]];
        int64_t hard = bins[pre[i] + 1];
        if (hard < L) L = hard;
        L -= seed[i];
        if (L < 0) L = 0;
        ebase[i + 1] = ebase[i] + L;
    }
#pragma omp parallel
    {
        std::vector<int64_t> cnt(R, 0), stamp(R, -1), first(R, 0);
        std::vector<int64_t> touched;
#pragma omp for schedule(dynamic, 64)
        for (int64_t q = 0; q < Q; q++) {
            touched.clear();
            for (int64_t i = qstart[q]; i < qstart[q + 1]; i++) {
                int64_t s = seed[i];
                int64_t e = run_end_ext[s];
                int64_t hard = bins[pre[i] + 1];
                if (hard < e) e = hard;
                int64_t prev = -1;
                for (int64_t j = s; j < e; j++) {
                    int64_t rx = rix[j];
                    if (rx == prev) continue;   // consecutive in-run dedupe
                    prev = rx;
                    if (stamp[rx] != q) {
                        stamp[rx] = q;
                        cnt[rx] = 1;
                        first[rx] = ebase[i] + (j - s);
                        touched.push_back(rx);
                    } else {
                        cnt[rx]++;
                    }
                }
            }
            // sorted-by-ref CSR (numpy np.unique(key) order)
            std::sort(touched.begin(), touched.end());
            int64_t o = qoff[q];
            int64_t m1 = 0, m2 = 0, mi = -1;
            for (size_t t = 0; t < touched.size(); t++) {
                int64_t rx = touched[t];
                int64_t c = cnt[rx];
                out_r[o + t] = rx;
                out_c[o + t] = c;
                out_first[o + t] = first[rx];
                if (c > m1) { m2 = m1; m1 = c; mi = rx; }
                else if (c == m1 && rx < mi) { m2 = m1; mi = rx; }
                else if (c > m2) { m2 = c; }
            }
            // mx2 carries multiplicity (two count==mx entries -> mx2 == mx):
            // a later equal-max entry lands in one of the two else branches,
            // both of which set m2 = m1
            nd[q] = (int64_t)touched.size();
            mx[q] = m1;
            mx2[q] = m2;
            mixv[q] = touched.empty() ? -1 : mi;
        }
    }
}

// Per-query output upper bounds for the tally kernels: bound[q] =
// min(total expanded pods of q's hits, cap) — the C twin of the glue's
// gather+segment-sum (the NumPy version measured ~as costly as the tally).
void xt_tally_bounds(const int64_t* pre, const int64_t* seed,
                     const int64_t* bins, const int64_t* run_end_ext,
                     int64_t Q, const int64_t* qstart, int64_t cap,
                     int64_t* bound) {
#pragma omp parallel for schedule(static)
    for (int64_t q = 0; q < Q; q++) {
        int64_t tot = 0;
        for (int64_t i = qstart[q]; i < qstart[q + 1]; i++) {
            int64_t L = run_end_ext[seed[i]];
            int64_t hard = bins[pre[i] + 1];
            if (hard < L) L = hard;
            L -= seed[i];
            if (L > 0) tot += L;
        }
        bound[q] = tot < cap ? tot : cap;
    }
}

// Per-(query, taxon) counts with per-seed-entry dedupe (each entry adds at
// most 1 per taxon, the sign trick xtree.c:1200-1215), optional lbin ancestor
// fold (-1 = drop).  Same span/offset scheme as xt_ref_tally; out_ins is the
// expanded-space flat index of the (query, taxon)'s global first encounter
// (align.py:_batch_h_tally's ins2).
void xt_h_tally(const int64_t* pre, const int64_t* seed,
                const int64_t* bins, const int64_t* run_end_ext,
                const int64_t* rix, const int64_t* hmap, const int64_t* lbin,
                int64_t Q, int64_t Hn,
                const int64_t* qstart, const int64_t* qoff,
                int64_t* out_h, int64_t* out_c, int64_t* out_ins,
                int64_t* nd) {
    std::vector<int64_t> ebase(qstart[Q] + 1, 0);
    for (int64_t i = 0; i < qstart[Q]; i++) {
        int64_t L = run_end_ext[seed[i]];
        int64_t hard = bins[pre[i] + 1];
        if (hard < L) L = hard;
        L -= seed[i];
        if (L < 0) L = 0;
        ebase[i + 1] = ebase[i] + L;
    }
#pragma omp parallel
    {
        std::vector<int64_t> cnt(Hn, 0), qstamp(Hn, -1), ins(Hn, 0);
        std::vector<int64_t> estamp(Hn, -1);  // per-entry dedupe epoch
        std::vector<int64_t> touched;
#pragma omp for schedule(dynamic, 64)
        for (int64_t q = 0; q < Q; q++) {
            touched.clear();
            for (int64_t i = qstart[q]; i < qstart[q + 1]; i++) {
                int64_t s = seed[i];
                int64_t e = run_end_ext[s];
                int64_t hard = bins[pre[i] + 1];
                if (hard < e) e = hard;
                for (int64_t j = s; j < e; j++) {
                    int64_t h = hmap[rix[j]];
                    if (lbin) {
                        h = lbin[h];
                        if (h == -1) continue;
                    }
                    if (estamp[h] == i) continue;  // this entry already voted h
                    estamp[h] = i;
                    if (qstamp[h] != q) {
                        qstamp[h] = q;
                        cnt[h] = 1;
                        ins[h] = ebase[i] + (j - s);
                        touched.push_back(h);
                    } else {
                        cnt[h]++;
                    }
                }
            }
            std::sort(touched.begin(), touched.end());
            int64_t o = qoff[q];
            for (size_t t = 0; t < touched.size(); t++) {
                int64_t h = touched[t];
                out_h[o + t] = h;
                out_c[o + t] = cnt[h];
                out_ins[o + t] = ins[h];
            }
            nd[q] = (int64_t)touched.size();
        }
    }
}

// Per-query perq output formatting (xtree.c:1344-1396's per-query print,
// batch form of align.py:_align_chunk's Python tail — the cProfile'd ~25%
// of host-mode ALIGN).  Lines are joined by '\n' with NO trailing newline,
// so the caller's `write(blob + "\n")` is byte-identical to writing each
// line + "\n".  Returns bytes written, or -1 if cap is too small (caller
// retries with a bigger buffer, the vote.cpp protocol).
int64_t xt_format_perq(int64_t Q,
                       const uint8_t* head_pool, const int64_t* head_off,
                       const uint8_t* rn_pool, const int64_t* rn_off,
                       const uint8_t* h0_pool, const int64_t* h0_off,
                       const uint8_t* h1_pool, const int64_t* h1_off,
                       const uint8_t* matched,
                       const int64_t* mixv, const int64_t* mx,
                       const int64_t* mx2, const int64_t* tix,
                       const int64_t* ft_ix, const int64_t* ft_lv,
                       uint8_t* out, int64_t cap) {
    static const char NOMATCH[] = "\tNo matches found";
    int64_t o = 0;
    for (int64_t q = 0; q < Q; q++) {
        if (q) {
            if (o + 1 > cap) return -1;
            out[o++] = '\n';
        }
        const int64_t hl = head_off[q + 1] - head_off[q];
        if (o + hl > cap) return -1;
        std::copy(head_pool + head_off[q], head_pool + head_off[q + 1],
                  out + o);
        o += hl;
        if (!matched[q]) {
            if (o + (int64_t)sizeof(NOMATCH) > cap) return -1;
            std::copy(NOMATCH, NOMATCH + sizeof(NOMATCH) - 1, out + o);
            o += sizeof(NOMATCH) - 1;
            continue;
        }
        const int64_t r = mixv[q];
        const int64_t rl = rn_off[r + 1] - rn_off[r];
        if (o + rl + 49 > cap) return -1;
        out[o++] = '\t';
        std::copy(rn_pool + rn_off[r], rn_pool + rn_off[r + 1], out + o);
        o += rl;
        o += snprintf((char*)out + o, 48, "\t[%lld,%lld]\t",
                      (long long)mx[q], (long long)mx2[q]);
        for (int h = 0; h < 2; h++) {
            const uint8_t* pool = h ? h1_pool : h0_pool;
            const int64_t* off = h ? h1_off : h0_off;
            const int64_t ix = ft_ix[2 * q + h];
            if (ix >= 0) {
                const uint8_t* s = pool + off[ix];
                int64_t sl = off[ix + 1] - off[ix];
                const int64_t lv = ft_lv[2 * q + h];
                if (lv > 0) {
                    // exact twin of the Python `p = s.find(b";", p + 1)`
                    // loop: a failed find restarts the next scan at offset 0
                    int64_t p = -1;
                    for (int64_t t = 0; t < lv; t++) {
                        const uint8_t* hit = (const uint8_t*)memchr(
                            s + (p + 1), ';', (size_t)(sl - (p + 1)));
                        p = hit ? (int64_t)(hit - s) : -1;
                    }
                    if (p >= 0) sl = p;
                }
                if (o + sl + 1 > cap) return -1;
                std::copy(s, s + sl, out + o);
                o += sl;
            } else if (o + 1 > cap) {
                return -1;
            }
            out[o++] = '\t';
        }
        if (o + 24 > cap) return -1;
        o += snprintf((char*)out + o, 24, "%lld", (long long)tix[q]);
    }
    return o;
}

}  // extern "C"
