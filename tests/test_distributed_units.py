"""Unit regressions for the multihost helpers (round-3 verified bugs)."""

import numpy as np

from utree_tpu.parallel.distributed import count_fasta_records, merge_sample_tallies


def test_count_fasta_records_chunk_boundary(tmp_path):
    # craft a file where '\n>' straddles the chunk boundary exactly
    rec = b">r%d\nACGTACGT\n"
    recs = b"".join(rec % i for i in range(100))
    path = tmp_path / "reads.fa"
    path.write_bytes(recs)
    true = recs.count(b"\n>") + 1
    assert count_fasta_records(str(path)) == true
    # every chunk size, including ones splitting each '\n>' pair
    for cb in range(1, 40):
        assert count_fasta_records(str(path), chunk_bytes=cb) == true, cb


def test_merge_sample_tallies_not_scaled_by_local_devices():
    # single process with 8 virtual local devices: a per-host tally must merge
    # to itself, not 8x itself (the round-2 bug: psum over replicated values)
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()).reshape(-1, 1)
    mesh = Mesh(devices, ("data", "table"))
    out = merge_sample_tallies(np.array([5, 7], np.int64), mesh)
    assert out.tolist() == [5, 7]
