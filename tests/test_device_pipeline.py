"""Device (jit) pipeline tests: identical to oracle + host path, on CPU mesh."""

import jax
import numpy as np

from utree_tpu.config import UTreeConfig
from utree_tpu.index import DeviceIndexArrays
from utree_tpu.pipeline import SearchPipeline
from utree_tpu.search_host import HostIndex, lookup_words


def test_devices_are_virtual_cpu():
    devs = jax.devices()
    assert len(devs) == 8 and devs[0].platform == "cpu"


def test_device_lookup_matches_host(toy):
    """Random words (hits and misses) look up identically on host and device."""
    cfg = UTreeConfig()
    hidx = HostIndex.from_ctr(str(toy["golden"]["ctr"]), cfg)
    didx = DeviceIndexArrays.from_ctr(str(toy["golden"]["ctr"]), cfg)

    rng = np.random.default_rng(5)
    # half random words, half actual DB words (guaranteed hits)
    from utree_tpu.formats import read_ubt

    ubt = read_ubt(str(toy["golden"]["ubt"]))
    sample = rng.choice(ubt.words, size=500)
    randoms = rng.integers(0, 1 << 63, size=500, dtype=np.uint64)
    words = np.concatenate([sample, randoms])

    host_ix = lookup_words(hidx, words)

    from utree_tpu.lookup import lookup_kmers

    qpre = (words >> np.uint64(40)).astype(np.int32)
    qhi = ((words >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    qlo = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    table = didx.device_put()
    dev_ix = np.asarray(
        lookup_kmers(table, qpre, qhi, qlo, np.ones(len(words), bool),
                     didx.probe_iters, cfg.bad_ix)
    )
    assert np.array_equal(host_ix, dev_ix)


def test_device_pipeline_classifications_identical(toy, tmp_path):
    idx = DeviceIndexArrays.from_ctr(str(toy["golden"]["ctr"]))
    pipe = SearchPipeline(idx, do_rc=False, batch_size=333)  # odd batch on purpose
    out = tmp_path / "dev.txt"
    n = pipe.search_file(toy["reads"], str(out))
    assert n == 1000
    assert out.read_bytes() == toy["golden"]["classifications"].read_bytes()


def test_device_pipeline_rc_identical(toy, tmp_path):
    idx = DeviceIndexArrays.from_ctr(str(toy["golden_rc"]["ctr"]))
    pipe = SearchPipeline(idx, do_rc=True, batch_size=256)
    out = tmp_path / "dev_rc.txt"
    pipe.search_file(toy["reads"], str(out))
    assert out.read_bytes() == toy["golden_rc"]["classifications"].read_bytes()


def test_index_from_build_equals_from_ctr(toy):
    """from_build (skipping the ubt/ctr round trip) builds the same index."""
    from utree_tpu.build import build_database

    cfg = UTreeConfig()
    res = build_database(toy["refs"], toy["map"], cfg)
    a = DeviceIndexArrays.from_build(res.words, res.ixs, res.labels.strings, cfg)
    b = DeviceIndexArrays.from_ctr(str(toy["golden"]["ctr"]), cfg)
    assert np.array_equal(a.bin_ix, b.bin_ix)
    assert np.array_equal(a.suf_hi, b.suf_hi)
    assert np.array_equal(a.suf_lo, b.suf_lo)
    assert np.array_equal(a.ix, b.ix)
    assert a.strings == b.strings


def test_all_lookup_modes_identical(toy, tmp_path):
    """canonical / hash / bsearch device tables must classify identically
    (the hash modes are exact reproductions of the probe replay)."""
    cfg = UTreeConfig()
    didx = DeviceIndexArrays.from_ctr(str(toy["golden"]["ctr"]), cfg)
    outs = []
    for mode in ("canonical", "hash", "bsearch"):
        pipe = SearchPipeline(didx, do_rc=True, batch_size=64, lookup_mode=mode)
        if mode == "canonical":
            assert "c1" in pipe._table
        elif mode == "hash":
            assert "t1" in pipe._table
        else:
            assert "bin_ix" in pipe._table
        out = tmp_path / f"cls_{mode}.txt"
        pipe.search_file(str(toy["reads"]), str(out))
        outs.append(out.read_bytes())
    assert outs[0] == toy["golden_rc"]["classifications"].read_bytes()
    assert outs[0] == outs[1] == outs[2]
