"""Streaming (out-of-core) build + compress must byte-match the in-memory
build (which is itself golden vs the reference oracle)."""

import numpy as np
import pytest

from utree_tpu.build import build_database
from utree_tpu.build_stream import build_database_streaming, write_ctr_streaming
from utree_tpu.config import UTreeConfig
from utree_tpu.formats import write_ctr_from_ubt, write_ubt
from utree_tpu.testdata import make_toy_db


@pytest.mark.parametrize("complevel,chunk_words,partition_bits",
                         [(1, 1 << 12, 3), (2, 997, 5), (0, 1 << 20, 2)])
def test_streaming_equals_memory(tmp_path, complevel, chunk_words, partition_bits):
    make_toy_db(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"),
                num_refs=12, ref_len=2500, seed=201 + complevel)
    cfg = UTreeConfig(complevel=complevel)
    res = build_database(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"), cfg)
    mem_ubt = tmp_path / "mem.ubt"
    write_ubt(str(mem_ubt), res.words, res.ixs, res.labels.strings, cfg)

    st_ubt = tmp_path / "stream.ubt"
    stats = build_database_streaming(
        str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"), cfg, str(st_ubt),
        chunk_words=chunk_words, partition_bits=partition_bits,
        workdir=str(tmp_path))
    assert st_ubt.read_bytes() == mem_ubt.read_bytes()
    assert stats.num_nodes == len(res.words)
    assert stats.num_conflicted == res.num_conflicted

    # streaming compress == in-memory compress
    mem_ctr = tmp_path / "mem.ctr"
    st_ctr = tmp_path / "stream.ctr"
    write_ctr_from_ubt(str(mem_ubt), str(mem_ctr), cfg)
    write_ctr_streaming(str(st_ubt), str(st_ctr), cfg, chunk_records=1 << 10)
    assert st_ctr.read_bytes() == mem_ctr.read_bytes()


def test_streaming_no_gg(tmp_path):
    make_toy_db(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"),
                num_refs=8, ref_len=1500, seed=209)
    cfg = UTreeConfig(complevel=1)
    res = build_database(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"),
                         cfg, do_gg=False)
    mem_ubt = tmp_path / "mem.ubt"
    write_ubt(str(mem_ubt), res.words, res.ixs, res.labels.strings, cfg)
    st_ubt = tmp_path / "stream.ubt"
    build_database_streaming(
        str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"), cfg, str(st_ubt),
        do_gg=False, chunk_words=2048, partition_bits=4, workdir=str(tmp_path))
    assert st_ubt.read_bytes() == mem_ubt.read_bytes()


def test_streaming_k64(tmp_path):
    make_toy_db(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"),
                num_refs=8, ref_len=2000, seed=213)
    cfg = UTreeConfig(packsize=64, ixtype_bytes=4)
    res = build_database(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"), cfg)
    mem_ubt = tmp_path / "mem.ubt"
    write_ubt(str(mem_ubt), res.words, res.ixs, res.labels.strings, cfg)
    st_ubt = tmp_path / "stream.ubt"
    build_database_streaming(
        str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"), cfg, str(st_ubt),
        chunk_words=4096, partition_bits=4, workdir=str(tmp_path))
    assert st_ubt.read_bytes() == mem_ubt.read_bytes()
