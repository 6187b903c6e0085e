"""PACKSIZE=64 + IXTYPE=uint32_t configuration (BASELINE config 4) goldens."""

import pytest

from utree_tpu.build import build_database
from utree_tpu.config import UTreeConfig
from utree_tpu.formats import write_ctr_from_ubt, write_ubt
from utree_tpu.oracle import run_oracle_pipeline
from utree_tpu.search_host import HostIndex, search_file
from utree_tpu.testdata import make_toy_db, make_toy_reads

CFG64 = UTreeConfig(packsize=64, ixtype_bytes=4)
DEFS = ("PACKSIZE=64", "IXTYPE=uint32_t")


@pytest.fixture(scope="module")
def toy64(tmp_path_factory):
    wd = tmp_path_factory.mktemp("toy64")
    records = make_toy_db(str(wd / "refs.fa"), str(wd / "tax.map"), num_refs=8, ref_len=3000, seed=77)
    make_toy_reads(str(wd / "reads.fa"), records, num_reads=300, read_len=150, seed=78)
    golden = run_oracle_pipeline(
        str(wd / "refs.fa"), str(wd / "tax.map"), str(wd / "reads.fa"),
        str(wd / "oracle"), complevel=1, extra_defs=DEFS, suffix="-64",
    )
    return {"dir": wd, "golden": golden}


def test_ubt64_bytes_identical(toy64, tmp_path):
    wd = toy64["dir"]
    res = build_database(str(wd / "refs.fa"), str(wd / "tax.map"), CFG64)
    ours = tmp_path / "ours.ubt"
    write_ubt(str(ours), res.words, res.ixs, res.labels.strings, CFG64)
    assert ours.read_bytes() == toy64["golden"]["ubt"].read_bytes()


def test_ctr64_bytes_identical(toy64, tmp_path):
    ours = tmp_path / "ours.ctr"
    write_ctr_from_ubt(str(toy64["golden"]["ubt"]), str(ours), CFG64)
    assert ours.read_bytes() == toy64["golden"]["ctr"].read_bytes()


def test_search64_classifications_identical(toy64, tmp_path):
    idx = HostIndex.from_ctr(str(toy64["golden"]["ctr"]), CFG64)
    out = tmp_path / "cls.txt"
    search_file(idx, str(toy64["dir"] / "reads.fa"), str(out), do_rc=False)
    assert out.read_bytes() == toy64["golden"]["classifications"].read_bytes()


def test_search64_rc_identical(toy64, tmp_path):
    wd = toy64["dir"]
    golden = run_oracle_pipeline(
        str(wd / "refs.fa"), str(wd / "tax.map"), str(wd / "reads.fa"),
        str(tmp_path / "oracle_rc"), complevel=1, do_rc=True,
        extra_defs=DEFS, suffix="-64",
    )
    idx = HostIndex.from_ctr(str(golden["ctr"]), CFG64)
    out = tmp_path / "cls_rc.txt"
    search_file(idx, str(wd / "reads.fa"), str(out), do_rc=True)
    assert out.read_bytes() == golden["classifications"].read_bytes()
