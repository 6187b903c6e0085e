"""Non-GG (rank-specific) build + search golden tests vs the reference."""

from utree_tpu.build import build_database
from utree_tpu.config import UTreeConfig
from utree_tpu.formats import write_ctr_from_ubt, write_ubt
from utree_tpu.oracle import run_oracle_pipeline
from utree_tpu.search_host import HostIndex, search_file_shallow


def test_nongg_pipeline_identical(toy, tmp_path):
    golden = run_oracle_pipeline(
        toy["refs"], toy["map"], toy["reads"], str(tmp_path / "oracle"),
        complevel=1, gg=False,
    )
    cfg = UTreeConfig()
    res = build_database(toy["refs"], toy["map"], cfg, do_gg=False)
    ours_ubt = tmp_path / "ours.ubt"
    write_ubt(str(ours_ubt), res.words, res.ixs, res.labels.strings, cfg)
    assert ours_ubt.read_bytes() == golden["ubt"].read_bytes()

    ours_ctr = tmp_path / "ours.ctr"
    write_ctr_from_ubt(str(ours_ubt), str(ours_ctr), cfg)
    assert ours_ctr.read_bytes() == golden["ctr"].read_bytes()

    idx = HostIndex.from_ctr(str(ours_ctr), cfg)
    out = tmp_path / "cls.txt"
    search_file_shallow(idx, toy["reads"], str(out), do_rc=False)
    assert out.read_bytes() == golden["classifications"].read_bytes()


def test_nongg_rc_identical(toy, tmp_path):
    golden = run_oracle_pipeline(
        toy["refs"], toy["map"], toy["reads"], str(tmp_path / "oracle_rc"),
        complevel=1, gg=False, do_rc=True,
    )
    idx = HostIndex.from_ctr(str(golden["ctr"]), UTreeConfig())
    out = tmp_path / "cls_rc.txt"
    search_file_shallow(idx, toy["reads"], str(out), do_rc=True)
    assert out.read_bytes() == golden["classifications"].read_bytes()
