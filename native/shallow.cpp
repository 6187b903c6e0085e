// Native shallow (non-GG) scan: the literal XT_WORD_SEARCH + XT_SHALLOWVOTE
// word state machine (itree.c:903-951) at C speed, hits only.
//
// The machine must be replayed literally because the skip-after-hit re-entry
// over-shifts the rolling word (itree.c:920-924) and the reference then looks
// up CORRUPTED k-mers until the corruption rolls out of the mask — so hit
// sequences depend on the exact word evolution, not just on clean windows.
// This is the Python scan_shallow_literal translated to the flat CTR arrays;
// exactness is asserted against it (and the compiled reference binary) in
// tests/test_nongg.py.
//
// Scope: PACKSIZE <= 32 (word fits u64, suffix lanes s_hi are all zero).
// The PACKSIZE=64 path stays in Python (rare, and host-bound anyway).

#include <cstdint>

namespace {

constexpr uint8_t kInvalid = 255;  // encode.INVALID

struct Ctr {
  const int64_t* bin_ix;
  const uint64_t* s_lo;
  const int64_t* ixs;
  int64_t suffix_bits;
  uint64_t suffix_mask;
  int64_t bad_ix;
};

// XT_getIX32 + xtSuffixBS replay (itree.c:699-730), u64 word.
inline int64_t lookup_one(const Ctr& c, uint64_t word) {
  const int64_t qpre = (int64_t)(word >> c.suffix_bits);
  const uint64_t q = word & c.suffix_mask;
  int64_t p = c.bin_ix[qpre];
  const int64_t end = c.bin_ix[qpre + 1];
  if (p >= end) return c.bad_ix;
  int64_t size = end - p - 1;
  while (size) {
    const int64_t w = size >> 1;
    if (c.s_lo[p + w + 1] <= q) {
      p += w + 1;
      size -= w + 1;
    } else {
      size = w;
    }
  }
  return c.s_lo[p] == q ? c.ixs[p] : c.bad_ix;
}

}  // namespace

extern "C" {

// One extended read (seq [+ N + revcomp]) of pre-encoded base codes ->
// shallow hit list.  Returns the number of hits written to `hits_out`
// (capacity must be >= number of windows; the caller sizes it).
int64_t utree_shallow_scan(
    const int64_t* bin_ix, const uint64_t* s_lo, const int64_t* ixs,
    int64_t suffix_bits, uint64_t suffix_mask, int64_t bad_ix,
    int64_t packsize, int64_t sparsity, int64_t word_bits, int64_t max_ix,
    const uint8_t* codes, int64_t length, int64_t* hits_out) {
  const Ctr ctr{bin_ix, s_lo, ixs, suffix_bits, suffix_mask, bad_ix};
  const int64_t k1 = packsize - 1;
  const int64_t kv = k1;
  const int64_t step = packsize / sparsity - 1;
  const uint64_t mask =
      word_bits >= 64 ? ~0ULL : ((1ULL << word_bits) - 1ULL);
  int64_t nhits = 0;
  uint64_t w = 0;
  int64_t i = kv;
  int64_t z = -4;
  while (i < length) {
    int64_t j;
    if (i < z + kv) {
      w = (w << ((i - z - 1) << 1)) & mask;
      j = z + 1;
    } else {
      w = 0;
      j = i - k1;
    }
    const int64_t p = j;
    bool broke = false;
    for (; j <= i; ++j) {
      const uint8_t c = codes[j];
      if (c > 3) {  // INVALID or any non-base code
        i += j - p;
        z = 0;
        broke = true;
        break;
      }
      w = ((w << 2) | c) & mask;
    }
    if (broke) {
      ++i;
      continue;
    }
    z = i;
    const int64_t ix = lookup_one(ctr, w);
    if (ix < max_ix) {
      hits_out[nhits++] = ix;
      i += step;
    }
    ++i;
  }
  return nhits;
}

// Batch: concatenated extended-read codes + offsets (R+1).  hits_out is
// sized sum(window counts); counts_out[r] = hits for read r, laid out
// back-to-back in read order.
void utree_shallow_scan_batch(
    const int64_t* bin_ix, const uint64_t* s_lo, const int64_t* ixs,
    int64_t suffix_bits, uint64_t suffix_mask, int64_t bad_ix,
    int64_t packsize, int64_t sparsity, int64_t word_bits, int64_t max_ix,
    const uint8_t* codes, const int64_t* offsets, int64_t num_reads,
    int64_t* hits_out, const int64_t* hit_offsets, int64_t* counts_out) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t r = 0; r < num_reads; ++r) {
    counts_out[r] = utree_shallow_scan(
        bin_ix, s_lo, ixs, suffix_bits, suffix_mask, bad_ix, packsize,
        sparsity, word_bits, max_ix, codes + offsets[r],
        offsets[r + 1] - offsets[r], hits_out + hit_offsets[r]);
  }
}

}  // extern "C"
