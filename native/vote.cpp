// Native vote + line formatting for the utree-tpu search pipeline.
//
// The device returns per-read sparse label histograms; this module turns them
// into classification lines with the reference's "optimal aufbau" semantics
// (itree.c:1028-1098, reimplemented — see utree_tpu/classify.py for the
// annotated Python reference implementation; both are property-tested for
// equality).  C++ because at >100K reads/s the per-read string walk dominates
// a Python host loop.
//
// Build: g++ -O3 -shared -fPIC -o libutreevote.so vote.cpp
// ABI: plain C, driven via ctypes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>

namespace {

constexpr uint32_t DV_M1 = 0xFFFFFFFFu;  // (uint32_t)-1
constexpr uint32_t DV_M2 = 0xFFFFFFFEu;  // (uint32_t)-2

struct TaxCnt {
  const char* s;
  uint32_t n;
};

// One read's aufbau walk over string-sorted (label, count) entries.
// Returns via out params: toPrint span (ptr,len), sl, ol.
void aufbau_walk(TaxCnt* tc, uint32_t uix, uint32_t found_uniq, uint32_t taxacut,
                 const char** print_s, uint32_t* print_len, int* print_full,
                 uint32_t* sl_out, uint32_t* ol_out) {
  uint32_t cutoff = found_uniq - found_uniq / taxacut;
  cutoff += (found_uniq >> 1) >= cutoff;
  uint32_t st = 0, ed = uix, dv = DV_M1, orun = found_uniq, sl = 0, ol = 0;
  for (;;) {
    uint32_t run = tc[st].n, td = dv;
    for (uint32_t z = st + 1; z < ed; ++z) {
      const char* s1 = tc[z - 1].s;
      const char* s2 = tc[z].s;
      uint32_t probe = (dv == DV_M1) ? 0u : dv;
      if (!s1[probe]) {
        run = tc[z].n;
        st = z;
        orun -= tc[z - 1].n;
        cutoff = orun - orun / taxacut;
        cutoff += (orun >> 1) >= cutoff;
        continue;
      }
      td = dv + 1;  // wraps to 0 when dv == DV_M1
      while (s1[td] && s1[td] == s2[td]) {
        if (s1[td] == ';') break;
        ++td;
      }
      if (s1[td] == s2[td]) {
        run += tc[z].n;
      } else if ((!s1[td] && s2[td] == ';') ||
                 ((s1[td] == ';' || !s1[td]) && td >= 1 && s1[td - 1] == '_')) {
        run = tc[z].n;
        st = z;
        orun -= tc[z - 1].n;
        cutoff = orun - orun / taxacut;
        cutoff += (orun >> 1) >= cutoff;
      } else if (run >= cutoff) {
        ed = z;
        break;
      } else {
        run = tc[z].n;
        st = z;
      }
    }
    sl = run;
    ol = orun;
    if (run < cutoff) break;
    if (st + 1 >= ed) {
      if (tc[ed - 1].n >= cutoff) dv = DV_M2;
      break;
    }
    if (!tc[ed - 1].s[td] || tc[ed - 1].s[td] == ';') {
      sl = run;
      ol = orun;
    }
    orun = run;
    dv = td;
    cutoff = run - run / taxacut;
    cutoff += (run >> 1) >= cutoff;
  }
  if (dv == DV_M1) {
    *print_s = "";
    *print_len = 0;
    *print_full = 0;
  } else if (dv == DV_M2) {
    *print_s = tc[ed - 1].s;
    *print_full = 1;
  } else {
    *print_s = tc[ed - 1].s;
    *print_len = dv;
    *print_full = 0;
  }
  *sl_out = sl;
  *ol_out = ol;
}

}  // namespace

extern "C" {

// Vote a batch of reads.  Histograms arrive CSR: read r owns
// labels/counts[hist_offsets[r] .. hist_offsets[r+1]).  Strings and names are
// '\0'-terminated in pools addressed by offset arrays.  Writes "name\t...\n"
// lines (reads with empty histograms are skipped) into out_buf.
// Returns bytes written, or -1 if out_cap would overflow.
int64_t utree_vote_batch(
    int64_t n_reads,
    const int64_t* hist_offsets,
    const int32_t* labels,
    const int32_t* counts,
    const char* string_pool,
    const int64_t* string_offsets,
    const char* name_pool,
    const int64_t* name_offsets,
    int32_t taxacut,
    char* out_buf,
    int64_t out_cap) {
  constexpr int MAX_U = 4096;
  TaxCnt tc[MAX_U];
  char* out = out_buf;
  char* out_end = out_buf + out_cap;

  for (int64_t r = 0; r < n_reads; ++r) {
    int64_t lo = hist_offsets[r], hi = hist_offsets[r + 1];
    int64_t nu = hi - lo;
    if (nu == 0) continue;
    if (nu > MAX_U) return -2;
    const char* name = name_pool + name_offsets[r];
    uint32_t found = 0;
    for (int64_t i = lo; i < hi; ++i) found += (uint32_t)counts[i];
    if (out_end - out < 65536 + 256) return -1;

    if (found == 1) {
      out += snprintf(out, out_end - out, "%s\t%s\t1\t1\t*\n", name,
                      string_pool + string_offsets[labels[lo]]);
      continue;
    }
    if (nu == 1) {
      out += snprintf(out, out_end - out, "%s\t%s\t%u\t1\t*\n", name,
                      string_pool + string_offsets[labels[lo]], found);
      continue;
    }
    for (int64_t i = lo; i < hi; ++i) {
      tc[i - lo] = {string_pool + string_offsets[labels[i]], (uint32_t)counts[i]};
    }
    std::sort(tc, tc + nu,
              [](const TaxCnt& a, const TaxCnt& b) { return strcmp(a.s, b.s) < 0; });
    const char* ps = "";
    uint32_t plen = 0, sl = 0, ol = 0;
    int pfull = 0;
    aufbau_walk(tc, (uint32_t)nu, found, (uint32_t)taxacut, &ps, &plen, &pfull,
                &sl, &ol);
    if (pfull) {
      out += snprintf(out, out_end - out, "%s\t%s\t%u\t%u\t%u;%u\n", name, ps,
                      found, (uint32_t)nu, sl, ol);
    } else {
      out += snprintf(out, out_end - out, "%s\t%.*s\t%u\t%u\t%u;%u\n", name,
                      (int)plen, ps, found, (uint32_t)nu, sl, ol);
    }
  }
  return out - out_buf;
}

}  // extern "C"
