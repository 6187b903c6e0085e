"""Unit tests for the rank-flexible fold and semicolon depth."""

from utree_tpu.taxonomy import LabelTable, count_semicolons, fold_labels


def test_fold_truncates_at_last_shared_semicolon():
    old = b"k__a;p__b;c__c;o__d"
    new = b"k__a;p__b;c__c;o__e"
    assert fold_labels(old, new, 2) == b"k__a;p__b;c__c"


def test_fold_bad_below_cutoff():
    assert fold_labels(b"k__a;p__b", b"k__a;p__c", 2) is None
    assert fold_labels(b"k__a;p__x", b"k__b;p__x", 2) is None


def test_fold_erosion_quirk():
    """old a proper prefix of new: the boundary ';' is NOT counted, so the
    node erodes one extra rank (itree.c:287-293 walk ends at old's '\\0')."""
    old = b"k__a;p__b;c__c"
    new = b"k__a;p__b;c__c;o__d"
    # shared ';' seen inside the equal region: after k__a and after p__b only
    assert fold_labels(old, new, 2) == b"k__a;p__b"


def test_fold_chain_erodes_progressively():
    t = LabelTable()
    strains = [
        b"k__a;p__b;c__c;o__d;f__e;g__f;s__1",
        b"k__a;p__b;c__c;o__d;f__e;g__f;s__2",
        b"k__a;p__b;c__c;o__d;f__e;g__f;s__3",
    ]
    state = strains[0]
    state = fold_labels(state, strains[1], 2)
    assert state == b"k__a;p__b;c__c;o__d;f__e;g__f"
    # next conflicting strain erodes one MORE rank (prefix case)
    state = fold_labels(state, strains[2], 2)
    assert state == b"k__a;p__b;c__c;o__d;f__e"


def test_label_table_insertion_order():
    t = LabelTable()
    assert t.get_or_add(b"x") == 0
    assert t.get_or_add(b"y") == 1
    assert t.get_or_add(b"x") == 0
    assert len(t) == 2


def test_count_semicolons():
    assert count_semicolons(b"k__a;p__b;c__c") == 2
    # stop at first ';' preceded by '_'
    assert count_semicolons(b"k__a;p__;c__c") == 1
    # 6 semicolons + non-'_' final char bumps to 7 (itree.c:1197)
    assert count_semicolons(b"k;p;c;o;f;g;s") == 7
    full = b"k__a;p__b;c__c;o__d;f__e;g__f;s__g"
    assert count_semicolons(full) == 7
    # blank last rank: no bump
    assert count_semicolons(b"k__a;p__b;c__c;o__d;f__e;g__f;s__") == 6


def test_aufbau_support_ranges_8col():
    """The README-documented 8-pair variant (reconstructed from the
    commented-out arrays, itree.c:1045,1097): first five columns must equal
    the reference-binary format, followed by 7 more SUPPORT;RANGE pairs."""
    from utree_tpu.classify import aufbau_vote

    strings = [
        b"k__a;p__b;c__c;o__d;f__e;g__f;s__g;t__h",
        b"k__a;p__b;c__c;o__d;f__e;g__f;s__g;t__i",
        b"k__a;p__b;c__zz;o__d;f__e;g__f;s__g;t__j",
    ]
    hits = [0] * 6 + [1] * 3 + [2] * 1
    one = aufbau_vote(b"q1", hits, strings)
    eight = aufbau_vote(b"q1", hits, strings, support_ranges=8)
    assert eight.startswith(one)
    extra = eight[len(one):].split(b"\t")[1:]
    assert len(extra) == 7
    assert all(b";" in p for p in extra)
    # levels actually descended carry non-zero support
    assert extra[0] != b"0;0"
    # single-label reads keep the reference's '*' line shape in both modes
    assert aufbau_vote(b"q2", [1], strings, support_ranges=8) == aufbau_vote(b"q2", [1], strings)


def test_host_search_file_support_ranges(tmp_path):
    """The host driver must accept and apply support_ranges (the CLI's
    --support-ranges 8 routes here with --host)."""
    from utree_tpu.build import build_database
    from utree_tpu.config import UTreeConfig
    from utree_tpu.formats import write_ctr_from_ubt, write_ubt
    from utree_tpu.search_host import HostIndex, search_file
    from utree_tpu.testdata import make_toy_db, make_toy_reads

    recs = make_toy_db(str(tmp_path / "r.fa"), str(tmp_path / "t.map"), seed=42)
    make_toy_reads(str(tmp_path / "q.fa"), recs, num_reads=60, seed=43)
    cfg = UTreeConfig(complevel=1)
    res = build_database(str(tmp_path / "r.fa"), str(tmp_path / "t.map"), cfg)
    write_ubt(str(tmp_path / "d.ubt"), res.words, res.ixs, res.labels.strings, cfg)
    write_ctr_from_ubt(str(tmp_path / "d.ubt"), str(tmp_path / "d.ctr"), cfg)
    idx = HostIndex.from_ctr(str(tmp_path / "d.ctr"), cfg)
    search_file(idx, str(tmp_path / "q.fa"), str(tmp_path / "o1.txt"), do_rc=True)
    search_file(idx, str(tmp_path / "q.fa"), str(tmp_path / "o8.txt"), do_rc=True,
                support_ranges=8)
    l1 = (tmp_path / "o1.txt").read_bytes().splitlines()
    l8 = (tmp_path / "o8.txt").read_bytes().splitlines()
    assert len(l1) == len(l8) and len(l1) > 0
    for a, b in zip(l1, l8):
        assert b.startswith(a)
        if not a.endswith(b"*"):  # voted rows gain exactly 7 extra pairs
            assert len(b.split(b"\t")) == len(a.split(b"\t")) + 7
