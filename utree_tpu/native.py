"""ctypes bridge to the native (C++) host runtime.

Compiled on demand from native/*.cpp into .native_build/ (no pip deps; plain
g++).  Falls back gracefully: callers check `vote_lib() is not None` and use
the pure-Python path otherwise.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
BUILD_DIR = REPO / ".native_build"
_vote_lib = None
_vote_tried = False


def _compile(src: str, out: str) -> pathlib.Path | None:
    BUILD_DIR.mkdir(exist_ok=True)
    so = BUILD_DIR / out
    cpp = REPO / "native" / src
    if so.exists() and so.stat().st_mtime >= cpp.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
             str(cpp), "-o", str(so)],
            check=True, capture_output=True,
        )
        return so
    except Exception:
        try:  # toolchains without OpenMP still get the serial build
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(cpp), "-o", str(so)],
                check=True, capture_output=True,
            )
            return so
        except Exception:
            return None


def vote_lib():
    """The libutreevote handle, or None if unavailable."""
    global _vote_lib, _vote_tried
    if _vote_tried:
        return _vote_lib
    _vote_tried = True
    so = _compile("vote.cpp", "libutreevote.so")
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.utree_vote_batch.restype = ctypes.c_int64
    lib.utree_vote_batch.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.utree_vote_packed.restype = ctypes.c_int64
    lib.utree_vote_packed.argtypes = [
        ctypes.c_int64, np.ctypeslib.ndpointer(np.uint32), ctypes.c_int64,
        ctypes.c_int64, np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.utree_format_device_vote.restype = ctypes.c_int64
    lib.utree_format_device_vote.argtypes = [
        ctypes.c_int64, np.ctypeslib.ndpointer(np.uint32),
        ctypes.c_int64, np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int64,
    ]
    _vote_lib = lib
    return lib


_shallow_lib = None
_shallow_tried = False


def shallow_lib():
    """libutreeshallow handle (the literal non-GG word state machine,
    itree.c:903-951, at C speed), or None if unavailable."""
    global _shallow_lib, _shallow_tried
    if _shallow_tried:
        return _shallow_lib
    _shallow_tried = True
    so = _compile("shallow.cpp", "libutreeshallow.so")
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.utree_shallow_scan_batch.restype = None
    lib.utree_shallow_scan_batch.argtypes = [
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.uint64),
        np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8), np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64),
    ]
    lib.utree_shallow_classify_batch.restype = ctypes.c_int64
    lib.utree_shallow_classify_batch.argtypes = [
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.uint64),
        np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
    ]
    _shallow_lib = lib
    return lib


def shallow_classify_file(index, reads_path: str, out_path: str,
                          do_rc: bool, chunk: int = 65536) -> int:
    """Whole-file shallow search with zero per-read Python: native FASTA
    scan + fused scan/vote/format batches (utree_shallow_classify_batch).
    Raises ValueError if the file is not linearized FASTA (caller falls
    back to the Python-driver path)."""
    lib = shallow_lib()
    cfg = index.config
    with open(reads_path, "rb") as f:
        data = f.read()
    sc = FastaScanner(data)
    n = sc.num_records
    recs_flat = np.ascontiguousarray(sc.recs.reshape(-1))
    seq_lens = sc.seq_lengths()
    ext = 2 * seq_lens + 1 if do_rc else seq_lens
    max_wins = int(max(0, int((ext - (cfg.packsize - 1)).max()))) if n else 0
    # persistent AllTheKingsHorses analog: zero-init ONCE per file; the
    # phantom-slot semantics then survive batch boundaries (see shallow.cpp)
    vote_buffer = np.zeros(max_wins + 2, np.int64)
    label_pool = b"".join(index.strings)
    label_offsets = np.zeros(len(index.strings) + 1, np.int64)
    np.cumsum([len(s) for s in index.strings], out=label_offsets[1:])
    max_label = max((len(s) for s in index.strings), default=0)
    with open(out_path, "wb") as fo:
        for f0 in range(0, n, chunk):
            count = min(chunk, n - f0)
            name_bytes = int((sc.recs[f0:f0 + count, 1]
                              - sc.recs[f0:f0 + count, 0]).sum())
            cap = name_bytes + count * (max_label + 48) + 64
            out = ctypes.create_string_buffer(cap)
            used = lib.utree_shallow_classify_batch(
                index.bin_ix, index.s_lo, index.ixs,
                cfg.ctr_suffix_bits, cfg.suffix_mask, cfg.bad_ix,
                cfg.packsize, cfg.sparsity, cfg.word_bits, index.num_labels,
                data, recs_flat, f0, count, 1 if do_rc else 0,
                label_pool, label_offsets, cfg.tolerance, cfg.slack,
                vote_buffer, len(vote_buffer), out, cap)
            if used < 0:
                raise RuntimeError(f"shallow classify batch failed: {used}")
            fo.write(out.raw[:used])
    return n


def shallow_scan_batch(index, ext_codes: list[np.ndarray]) -> list[list[int]]:
    """Batch scan_shallow over pre-extended encoded reads (seq [+N+rc]).
    `index` is a search_host.HostIndex with packsize <= 32 (s_hi all zero)."""
    lib = shallow_lib()
    cfg = index.config
    n = len(ext_codes)
    lens = np.array([len(c) for c in ext_codes], np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    codes = np.concatenate(ext_codes) if n else np.zeros(0, np.uint8)
    wins = np.maximum(lens - (cfg.packsize - 1), 0)
    hit_offsets = np.zeros(n + 1, np.int64)
    np.cumsum(wins, out=hit_offsets[1:])
    hits = np.zeros(max(1, int(hit_offsets[-1])), np.int64)
    counts = np.zeros(max(1, n), np.int64)
    lib.utree_shallow_scan_batch(
        index.bin_ix, index.s_lo, index.ixs,
        cfg.ctr_suffix_bits, cfg.suffix_mask, cfg.bad_ix,
        cfg.packsize, cfg.sparsity, cfg.word_bits, index.num_labels,
        codes, offsets, n, hits, hit_offsets, counts,
    )
    return [hits[hit_offsets[r] : hit_offsets[r] + counts[r]].tolist()
            for r in range(n)]


_fasta_lib = None
_fasta_tried = False


def fasta_lib():
    global _fasta_lib, _fasta_tried
    if _fasta_tried:
        return _fasta_lib
    _fasta_tried = True
    so = _compile("fasta.cpp", "libutreefasta.so")
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.utree_scan_fasta.restype = ctypes.c_int64
    lib.utree_scan_fasta.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
    ]
    lib.utree_pack_batch.restype = ctypes.c_int64
    lib.utree_pack_batch.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8), np.ctypeslib.ndpointer(np.int32),
        ctypes.c_char_p, ctypes.c_int64, np.ctypeslib.ndpointer(np.int64),
    ]
    lib.utree_pack_batch_2bit.restype = ctypes.c_int64
    lib.utree_pack_batch_2bit.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8), np.ctypeslib.ndpointer(np.uint8),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_char_p, ctypes.c_int64, np.ctypeslib.ndpointer(np.int64),
    ]
    _fasta_lib = lib
    return lib


class FastaScanner:
    """Whole-file record table + zero-copy-ish batch packing (C++)."""

    def __init__(self, data: bytes):
        self.lib = fasta_lib()
        if self.lib is None:
            raise RuntimeError("native fasta lib unavailable")
        self.data = data
        max_recs = max(16, data.count(b">") + 1)
        recs = np.zeros(max_recs * 4, np.int64)
        n = self.lib.utree_scan_fasta(data, len(data), recs, max_recs)
        if n < 0:
            raise ValueError(f"malformed FASTA at byte {-n - 1}")
        self.num_records = int(n)
        self.recs = recs[: n * 4].reshape(n, 4)

    def seq_lengths(self) -> np.ndarray:
        return self.recs[:, 3] - self.recs[:, 2]

    def pack(self, first: int, count: int, lmax: int, rows: int | None = None):
        """(reads (rows,lmax) u8, lens i32, name_pool bytes, name_offsets);
        rows > count pre-pads the batch (pad rows stay zero, no np.pad copy)."""
        rows = count if rows is None else max(rows, count)
        reads = np.zeros((rows, lmax), np.uint8)
        lens = np.zeros(rows, np.int32)
        name_offsets = np.zeros(count + 1, np.int64)
        cap = int((self.recs[first : first + count, 1] - self.recs[first : first + count, 0]).sum() + count + 16)
        pool = ctypes.create_string_buffer(cap)
        used = self.lib.utree_pack_batch(
            self.data, self.recs.reshape(-1), first, count, lmax,
            reads, lens, pool, cap, name_offsets,
        )
        if used < 0:
            raise ValueError(f"pack error {used}")
        return reads, lens, pool.raw[:used], name_offsets

    def pack_2bit(self, first: int, count: int, lmax: int, rows: int | None = None):
        """(packed (rows,lmax/4) u8, vbits (rows,lmax/8) u8, lens i32,
        name_pool bytes, name_offsets) — bit-identical to
        lookup.pack_reads_host over the ASCII matrix, done in C++.
        rows > count pre-pads the batch (pad rows stay zero, no np.pad copy)."""
        assert lmax % 8 == 0
        rows = count if rows is None else max(rows, count)
        packed = np.zeros((rows, lmax // 4), np.uint8)
        vbits = np.zeros((rows, lmax // 8), np.uint8)
        lens = np.zeros(rows, np.int32)
        name_offsets = np.zeros(count + 1, np.int64)
        cap = int((self.recs[first : first + count, 1] - self.recs[first : first + count, 0]).sum() + count + 16)
        pool = ctypes.create_string_buffer(cap)
        used = self.lib.utree_pack_batch_2bit(
            self.data, self.recs.reshape(-1), first, count, lmax,
            packed, vbits, lens, pool, cap, name_offsets,
        )
        if used < 0:
            raise ValueError(f"pack error {used}")
        return packed, vbits, lens, pool.raw[:used], name_offsets

    def record_seq(self, i: int) -> bytes:
        a, b = int(self.recs[i, 2]), int(self.recs[i, 3])
        return self.data[a:b]

    def record_name(self, i: int) -> bytes:
        a, b = int(self.recs[i, 0]), int(self.recs[i, 1])
        return self.data[a:b]


class VoteEngine:
    """Batch aufbau vote + formatting in C++ (exact peer of classify.py)."""

    def __init__(self, strings: list[bytes], taxacut: int):
        self.taxacut = taxacut
        self.lib = vote_lib()
        if self.lib is not None:
            offs = np.zeros(len(strings) + 1, np.int64)
            for i, s in enumerate(strings):
                offs[i + 1] = offs[i] + len(s) + 1
            self.string_pool = b"\x00".join(strings) + b"\x00"
            self.string_offsets = offs
            self.max_label = max((len(s) for s in strings), default=0)

    def _out_cap(self, n: int, name_pool_len: int) -> int:
        """First-try output budget: every line is name + one label + ~48
        digits/tabs.  Under-sizing costs a FULL re-format pass per growth
        retry (measured as a real share of drain:vote at 65536-read
        batches), so start at the bound instead of 1MB-and-grow."""
        return max(1 << 20, name_pool_len + n * (self.max_label + 48))

    @property
    def available(self) -> bool:
        return self.lib is not None

    def vote_batch(
        self,
        names: list[bytes],
        hist_offsets: np.ndarray,
        labels: np.ndarray,
        counts: np.ndarray,
    ) -> bytes:
        """CSR histograms -> concatenated output lines (reads with empty
        histograms omitted), in read order."""
        n = len(names)
        name_offsets = np.zeros(n + 1, np.int64)
        for i, nm in enumerate(names):
            name_offsets[i + 1] = name_offsets[i] + len(nm) + 1
        name_pool = b"\x00".join(names) + b"\x00" if names else b"\x00"
        return self.vote_batch_pooled(n, name_pool, name_offsets[:-1], hist_offsets, labels, counts)

    def vote_batch_pooled(
        self,
        n: int,
        name_pool: bytes,
        name_offsets: np.ndarray,
        hist_offsets: np.ndarray,
        labels: np.ndarray,
        counts: np.ndarray,
    ) -> bytes:
        cap = self._out_cap(n, len(name_pool))
        while True:
            out = ctypes.create_string_buffer(cap)
            wrote = self.lib.utree_vote_batch(
                n,
                np.ascontiguousarray(hist_offsets, np.int64),
                np.ascontiguousarray(labels, np.int32),
                np.ascontiguousarray(counts, np.int32),
                self.string_pool,
                self.string_offsets,
                name_pool,
                name_offsets,
                self.taxacut,
                out,
                cap,
            )
            if wrote == -1:
                cap *= 4
                continue
            if wrote < 0:
                raise RuntimeError(f"utree_vote_batch error {wrote}")
            return out.raw[:wrote]

    def vote_packed(
        self,
        n: int,
        name_pool: bytes,
        name_offsets: np.ndarray,
        packed: np.ndarray,
        cap_cols: int,
        over_rows: np.ndarray,
        over_offsets: np.ndarray,
        over_labels: np.ndarray,
        over_counts: np.ndarray,
    ) -> bytes:
        """Vote straight off the device's packed (count<<16|label+1, tail)
        u32 matrix — unpack + CSR flatten + vote + formatting all in C++.
        Rows whose nuniq exceeds cap_cols must be listed (ascending) in the
        override CSR (host-exact recompute, the cap-overflow contract)."""
        packed = np.ascontiguousarray(packed, np.uint32)
        cap = self._out_cap(n, len(name_pool))
        while True:
            out = ctypes.create_string_buffer(cap)
            wrote = self.lib.utree_vote_packed(
                n, packed, cap_cols,
                len(over_rows),
                np.ascontiguousarray(over_rows, np.int64),
                np.ascontiguousarray(over_offsets, np.int64),
                np.ascontiguousarray(over_labels, np.int32),
                np.ascontiguousarray(over_counts, np.int32),
                self.string_pool, self.string_offsets,
                name_pool, np.ascontiguousarray(name_offsets, np.int64),
                self.taxacut, out, cap,
            )
            if wrote == -1:
                cap *= 4
                continue
            if wrote < 0:
                raise RuntimeError(f"utree_vote_packed error {wrote}")
            return out.raw[:wrote]

    def format_device_vote(
        self,
        n: int,
        name_pool: bytes,
        name_offsets: np.ndarray,
        rows: np.ndarray,
        over_rows: np.ndarray,
        over_offsets: np.ndarray,
        over_labels: np.ndarray,
        over_counts: np.ndarray,
    ) -> bytes:
        """Format lines from the device-voted (B, 3) u32 rows
        (lookup.search_step_vote_compact layout); flagged rows take the
        override CSR through the full host walk in C."""
        rows = np.ascontiguousarray(rows, np.uint32)
        cap = self._out_cap(n, len(name_pool))
        while True:
            out = ctypes.create_string_buffer(cap)
            wrote = self.lib.utree_format_device_vote(
                n, rows, len(over_rows),
                np.ascontiguousarray(over_rows, np.int64),
                np.ascontiguousarray(over_offsets, np.int64),
                np.ascontiguousarray(over_labels, np.int32),
                np.ascontiguousarray(over_counts, np.int32),
                self.string_pool, self.string_offsets,
                name_pool, np.ascontiguousarray(name_offsets, np.int64),
                self.taxacut, out, cap,
            )
            if wrote == -1:
                cap *= 4
                continue
            if wrote < 0:
                raise RuntimeError(f"utree_format_device_vote error {wrote}")
            return out.raw[:wrote]


_xtree_lib = None
_xtree_tried = False


def xtree_lib():
    """libutreextree handle (the ALIGN scan hot loop), or None."""
    global _xtree_lib, _xtree_tried
    if _xtree_tried:
        return _xtree_lib
    _xtree_tried = True
    so = _compile("xtree.cpp", "libutreextree.so")
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    I64 = np.ctypeslib.ndpointer(np.int64)
    lib.xt_scan_hits.restype = None
    lib.xt_scan_hits.argtypes = [
        ctypes.c_int64, ctypes.c_char_p, I64, I64,
        ctypes.c_int32, ctypes.c_int32,
        I64, I64, I64, I64, I64, I64,
    ]
    lib.xt_scan_queries.restype = ctypes.c_int64
    lib.xt_scan_queries.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, I64, ctypes.c_int64,
    ]
    lib.xt_scan_hits_tally.restype = None
    lib.xt_scan_hits_tally.argtypes = [
        ctypes.c_int64, ctypes.c_char_p, I64, I64,
        ctypes.c_int32, ctypes.c_int32,
        I64, I64, I64, I64, ctypes.c_int64,
        I64, I64, I64, I64, I64, I64, I64,
    ]
    _xtree_lib = lib
    return lib


def xt_scan_hits_tally(lib, pool, qs, qe, k: int, pl: int, bins, sfx,
                       run_end_ext, rix, R: int):
    """Fused scan + ref vote (native/xtree.cpp:xt_scan_hits_tally):
    (qid, prefix, seed, tix, mx, mx2, mix) for a query chunk — the fast
    path's whole pre-taxonomy stage in one C pass."""
    nq = len(qs)
    wn = np.maximum((qe - qs) - k + 1, 0)
    qoff = np.zeros(nq + 1, np.int64)
    np.cumsum(2 * wn, out=qoff[1:])
    pre_out = np.empty(int(qoff[-1]), np.int64)
    seed_out = np.empty(int(qoff[-1]), np.int64)
    counts = np.zeros(nq, np.int64)
    mx = np.zeros(nq, np.int64)
    mx2 = np.zeros(nq, np.int64)
    mix = np.zeros(nq, np.int64)
    lib.xt_scan_hits_tally(
        nq, pool, np.ascontiguousarray(qs, np.int64),
        np.ascontiguousarray(qe, np.int64), k, pl, bins, sfx,
        run_end_ext, rix, R, qoff, pre_out, seed_out, counts, mx, mx2, mix)
    qid = np.repeat(np.arange(nq, dtype=np.int64), counts)
    if int(counts.sum()) != int(qoff[-1]):
        from utree_tpu.hash_index import _ranges_to_indices

        nz = counts > 0
        idx = _ranges_to_indices(qoff[:-1][nz], counts[nz])
        pre_out, seed_out = pre_out[idx], seed_out[idx]
    return qid, pre_out, seed_out, counts, mx, mx2, mix


def xt_scan_queries(lib, data: bytes) -> np.ndarray:
    """(n, 4) record quads [hstart, hend, sstart, send] for a FASTA/FASTQ
    buffer — the C twin of xtree/io.iter_queries (full-header names)."""
    max_recs = max(16, data.count(b"\n") // 2 + 2)
    recs = np.zeros(max_recs * 4, np.int64)
    n = lib.xt_scan_queries(data, len(data), recs, max_recs)
    if n < 0:
        raise ValueError("query record table overflow")
    return recs[: n * 4].reshape(n, 4)


def xt_scan_hits(lib, pool, qs: np.ndarray, qe: np.ndarray, k: int, pl: int,
                 bins: np.ndarray, sfx: np.ndarray):
    """(qid, prefix, seed) hit triples for a query chunk, scan order —
    the C++ twin of xtree.align.XtreeAligner._batch_hits.  `qs`/`qe` are
    per-query [start, end) spans into `pool` (the file buffer on the fast
    path — no per-query copies)."""
    nq = len(qs)
    wn = np.maximum((qe - qs) - k + 1, 0)
    qoff = np.zeros(nq + 1, np.int64)
    np.cumsum(2 * wn, out=qoff[1:])
    pre_out = np.empty(int(qoff[-1]), np.int64)
    seed_out = np.empty(int(qoff[-1]), np.int64)
    counts = np.zeros(nq, np.int64)
    lib.xt_scan_hits(nq, pool, np.ascontiguousarray(qs, np.int64),
                     np.ascontiguousarray(qe, np.int64),
                     k, pl, bins, sfx, qoff, pre_out, seed_out, counts)
    qid = np.repeat(np.arange(nq, dtype=np.int64), counts)
    if int(counts.sum()) == int(qoff[-1]):
        return qid, pre_out, seed_out
    from utree_tpu.hash_index import _ranges_to_indices

    nz = counts > 0  # _ranges_to_indices assumes nonempty ranges
    idx = _ranges_to_indices(qoff[:-1][nz], counts[nz])
    return qid, pre_out[idx], seed_out[idx]


def _xt_register_tally(lib):
    if getattr(lib, "_tally_registered", False):
        return
    I64 = np.ctypeslib.ndpointer(np.int64)
    lib.xt_ref_tally.restype = None
    lib.xt_ref_tally.argtypes = [I64, I64, I64, I64, I64, I64,
                                 ctypes.c_int64, ctypes.c_int64,
                                 I64, I64, I64, I64, I64, I64, I64, I64, I64]
    lib.xt_h_tally.restype = None
    lib.xt_h_tally.argtypes = [I64, I64, I64, I64, I64, I64,
                               ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_int64,
                               I64, I64, I64, I64, I64, I64]
    lib.xt_tally_bounds.restype = None
    lib.xt_tally_bounds.argtypes = [I64, I64, I64, I64, ctypes.c_int64,
                                    I64, ctypes.c_int64, I64]
    lib._tally_registered = True


def _xt_spans(lib, qid, seed, pre, bins, run_end_ext, Q, cap_per_q):
    """Per-query hit bounds + output upper-bound offsets for the tally
    kernels: qstart from the qid-ascending hit order; qoff bounds distinct
    outputs by min(expanded pods of q, cap_per_q) (computed in C)."""
    qstart = np.searchsorted(qid, np.arange(Q + 1)).astype(np.int64)
    qoff = np.zeros(Q + 1, np.int64)
    lib.xt_tally_bounds(pre, seed, bins, run_end_ext, Q, qstart, cap_per_q,
                        qoff[1:])
    np.cumsum(qoff[1:], out=qoff[1:])
    return qstart, qoff


def xt_ref_tally(lib, qid, pre, seed, bins, run_end_ext, rix, Q, R):
    """C++ twin of align.py:_batch_ref_tally's tally core.  Returns
    (mx, mx2, mix, qu, rxu, counts, first, nd) with the CSR compacted and
    sorted by (query, ref)."""
    _xt_register_tally(lib)
    qstart, qoff = _xt_spans(lib, qid, seed, pre, bins, run_end_ext, Q, R)
    mx = np.zeros(Q, np.int64)
    mx2 = np.zeros(Q, np.int64)
    mix = np.zeros(Q, np.int64)
    out_r = np.empty(int(qoff[-1]), np.int64)
    out_c = np.empty(int(qoff[-1]), np.int64)
    out_first = np.empty(int(qoff[-1]), np.int64)
    nd = np.zeros(Q, np.int64)
    lib.xt_ref_tally(qid, pre, seed, bins, run_end_ext, rix, Q, R,
                     qstart, qoff, mx, mx2, mix, out_r, out_c, out_first, nd)
    qu = np.repeat(np.arange(Q, dtype=np.int64), nd)
    if int(nd.sum()) != int(qoff[-1]):
        from utree_tpu.hash_index import _ranges_to_indices

        nz = nd > 0
        idx = _ranges_to_indices(qoff[:-1][nz], nd[nz])
        out_r, out_c, out_first = out_r[idx], out_c[idx], out_first[idx]
    return mx, mx2, mix, qu, out_r, out_c, out_first, nd


class StringPool:
    """Concatenated byte-string table + offsets for C consumption."""

    def __init__(self, strings: list[bytes]):
        self.pool = b"".join(strings)
        off = np.zeros(len(strings) + 1, np.int64)
        np.cumsum([len(s) for s in strings], out=off[1:])
        self.off = off
        self.max_len = int(np.diff(off).max()) if len(strings) else 0


def _xt_register_perq(lib):
    if getattr(lib, "_perq_registered", False):
        return
    I64 = np.ctypeslib.ndpointer(np.int64)
    lib.xt_format_perq.restype = ctypes.c_int64
    lib.xt_format_perq.argtypes = [
        ctypes.c_int64,
        ctypes.c_char_p, I64, I64,  # head pool + [start, end) spans
        ctypes.c_char_p, I64,  # ref names
        ctypes.c_char_p, I64,  # h_strings[0]
        ctypes.c_char_p, I64,  # h_strings[1]
        np.ctypeslib.ndpointer(np.uint8),
        I64, I64, I64, I64,    # mix, mx, mx2, tix
        I64, I64,              # ft_ix, ft_lv (Q,2) row-major
        ctypes.c_char_p, ctypes.c_int64,
    ]
    lib._perq_registered = True


def xt_format_perq(lib, head_pool, head_s, head_e, pools, matched, mix, mx,
                   mx2, tix, ft_ix, ft_lv) -> bytes:
    """Chunk perq lines, '\\n'-joined with no trailing newline — byte twin of
    align.py:_align_chunk's per-query formatting tail.  Heads come as
    [start, end) spans into `head_pool` (the file buffer on the fast path).
    `pools` = (ref_names, h_strings[0], h_strings[1]) StringPools."""
    _xt_register_perq(lib)
    Q = len(head_s)
    head_s = np.ascontiguousarray(head_s, np.int64)
    head_e = np.ascontiguousarray(head_e, np.int64)
    rn, h0, h1 = pools
    nmatch = int(np.count_nonzero(matched))
    cap = (int((head_e - head_s).sum()) + 75 * Q + 8
           + nmatch * (rn.max_len + h0.max_len + h1.max_len))
    i64 = lambda a: np.ascontiguousarray(a, np.int64)
    while True:
        out = ctypes.create_string_buffer(cap)
        wrote = lib.xt_format_perq(
            Q, head_pool, head_s, head_e,
            rn.pool, rn.off, h0.pool, h0.off, h1.pool, h1.off,
            np.ascontiguousarray(matched, np.uint8),
            i64(mix), i64(mx), i64(mx2), i64(tix),
            i64(ft_ix).reshape(-1), i64(ft_lv).reshape(-1),
            out, cap)
        if wrote == -1:
            cap *= 4
            continue
        if wrote < 0:
            raise RuntimeError(f"xt_format_perq error {wrote}")
        return out.raw[:wrote]


def _xt_register_deep(lib):
    if getattr(lib, "_deep_registered", False):
        return
    I64 = np.ctypeslib.ndpointer(np.int64)
    lib.xt_deep_call.restype = None
    lib.xt_deep_call.argtypes = [
        I64, ctypes.c_int64, I64, I64, I64, I64, I64, I64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        I64, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        I64, I64, I64,
    ]
    lib._deep_registered = True


def xt_deep_call(lib, deepq, qstart, pre, seed, bins, run_end_ext, rix,
                 pack, tix, conf, full_lca, tax_out, ft_ix, ft_lv, mb):
    """Fused deep taxonomy call (native/xtree.cpp:xt_deep_call): full-string
    tally + LBins level walk per ambiguous query, writing ft_ix/ft_lv/mb
    rows in place.  `pack` = XtreeAligner._deep_pack (cached int64 hmaps +
    row-major lbins stacks)."""
    _xt_register_deep(lib)
    hm0, Hn0, lb0, L0, hm1, Hn1, lb1, L1, has0, has1 = pack
    vp = lambda a: None if a is None else a.ctypes.data_as(ctypes.c_void_p)
    lib.xt_deep_call(
        np.ascontiguousarray(deepq, np.int64), len(deepq), qstart,
        np.ascontiguousarray(pre, np.int64),
        np.ascontiguousarray(seed, np.int64), bins, run_end_ext, rix,
        vp(hm0), Hn0, vp(lb0), L0, vp(hm1), Hn1, vp(lb1), L1,
        has0, has1, np.ascontiguousarray(tix, np.int64), float(conf),
        1 if full_lca else 0, 1 if tax_out else 0,
        ft_ix.reshape(-1), ft_lv.reshape(-1), mb.reshape(-1))


def xt_h_tally(lib, qid, pre, seed, bins, run_end_ext, rix, hmap, Hn, Q,
               lbin=None):
    """C++ twin of align.py:_batch_h_tally: (q2, h2, c2, ins2) CSR."""
    _xt_register_tally(lib)
    qstart, qoff = _xt_spans(lib, qid, seed, pre, bins, run_end_ext, Q, Hn)
    out_h = np.empty(int(qoff[-1]), np.int64)
    out_c = np.empty(int(qoff[-1]), np.int64)
    out_ins = np.empty(int(qoff[-1]), np.int64)
    nd = np.zeros(Q, np.int64)
    lb = lbin.ctypes.data_as(ctypes.c_void_p) if lbin is not None else None
    lib.xt_h_tally(pre, seed, bins, run_end_ext, rix, hmap, lb, Q, Hn,
                   qstart, qoff, out_h, out_c, out_ins, nd)
    q2 = np.repeat(np.arange(Q, dtype=np.int64), nd)
    if int(nd.sum()) != int(qoff[-1]):
        from utree_tpu.hash_index import _ranges_to_indices

        nz = nd > 0
        idx = _ranges_to_indices(qoff[:-1][nz], nd[nz])
        out_h, out_c, out_ins = out_h[idx], out_c[idx], out_ins[idx]
    return q2, out_h, out_c, out_ins
