"""End-to-end batched search pipeline (device lookup + host vote/format).

Replaces the reference's thread-per-read search (XT_doSearch32 under
`#pragma omp parallel`, itree.c:1009-1101) with:

  host: pack reads into fixed-shape uint8 batches (length-bucketed to bound
        recompiles) ->
  device (jit): base-coding, RC append, window packing, flat-table lookup ->
  host: vectorized per-read histograms (one np.unique over all hits) ->
        aufbau vote + line formatting (classify.py).

Output lines are emitted in read order, equal to the single-threaded
reference binary's output (multithreading only permutes its line order).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from utree_tpu.classify import aufbau_vote_counts
from utree_tpu.config import UTreeConfig
from utree_tpu.index import DeviceIndexArrays
from utree_tpu.io.fasta import iter_fasta_records
from utree_tpu.lookup import search_step


def _bucket_len(n: int, minimum: int = 64) -> int:
    """Round length up to a power of two to bound jit recompiles."""
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class SearchPipeline:
    index: DeviceIndexArrays
    do_rc: bool = False
    batch_size: int = 2048
    _table: dict = None  # device arrays

    def __post_init__(self):
        if self._table is None:
            self._table = self.index.device_put()

    def lookup_batch(self, reads_u8: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """(B, L) ASCII + lengths -> (B, W) label ids (bad_ix = miss)."""
        cfg = self.index.config
        out = search_step(
            self._table,
            jax.numpy.asarray(reads_u8),
            jax.numpy.asarray(lengths.astype(np.int32)),
            k=cfg.packsize,
            do_rc=self.do_rc,
            probe_iters=self.index.probe_iters,
            bad_ix=cfg.bad_ix,
        )
        return np.asarray(jax.device_get(out))

    def classify_batch(self, names: list[bytes], seqs: list[bytes]) -> list[bytes | None]:
        """Vote lines for a batch of reads (None where the read had no hits)."""
        bsz = len(seqs)
        max_len = max((len(s) for s in seqs), default=1)
        lmax = _bucket_len(max(max_len, self.index.config.packsize))
        reads = np.zeros((bsz, lmax), dtype=np.uint8)
        lengths = np.zeros(bsz, dtype=np.int32)
        for i, s in enumerate(seqs):
            reads[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            lengths[i] = len(s)
        ix_mat = self.lookup_batch(reads, lengths)

        num_labels = self.index.num_labels
        hit_r, hit_c = np.nonzero(ix_mat < num_labels)
        hit_v = ix_mat[hit_r, hit_c].astype(np.int64)
        # one global unique over (read, label) keys = all per-read histograms
        keys = hit_r.astype(np.int64) * num_labels + hit_v
        uk, cnts = np.unique(keys, return_counts=True)
        urow = (uk // num_labels).astype(np.int64)
        uval = uk % num_labels
        starts = np.searchsorted(urow, np.arange(bsz + 1))

        lines: list[bytes | None] = []
        strings = self.index.strings
        taxacut = self.index.config.taxacut
        for i, name in enumerate(names):
            s, e = starts[i], starts[i + 1]
            lines.append(aufbau_vote_counts(name, uval[s:e], cnts[s:e], strings, taxacut))
        return lines

    def search_file(self, reads_path: str, out_path: str) -> int:
        n = 0
        names: list[bytes] = []
        seqs: list[bytes] = []
        with open(out_path, "wb") as fo:
            def flush():
                for line in self.classify_batch(names, seqs):
                    if line is not None:
                        fo.write(line + b"\n")
                names.clear()
                seqs.clear()

            for header, seq in iter_fasta_records(reads_path):
                n += 1
                names.append(header.split(b" ")[0])
                seqs.append(seq)
                if len(seqs) >= self.batch_size:
                    flush()
            if seqs:
                flush()
        return n
