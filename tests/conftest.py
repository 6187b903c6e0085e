"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices (jax.sharding over --xla_force_host_platform_device_count).
"""

import os

# Disable the axon TPU-tunnel registration (its sitecustomize would force
# jax_platforms=axon) and run on 8 virtual CPU devices instead.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize may have already run register(), which calls
# jax.config.update("jax_platforms", "axon,cpu"); backends are lazy, so
# overriding back to cpu here still wins.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from utree_tpu.testdata import make_toy_db, make_toy_reads  # noqa: E402


@pytest.fixture(scope="session")
def toy(tmp_path_factory):
    """Toy DB + reads + oracle golden outputs (BASELINE.json config 1)."""
    from utree_tpu.oracle import run_oracle_pipeline

    wd = tmp_path_factory.mktemp("toy")
    records = make_toy_db(str(wd / "refs.fa"), str(wd / "tax.map"))
    make_toy_reads(str(wd / "reads.fa"), records)
    golden = run_oracle_pipeline(
        str(wd / "refs.fa"), str(wd / "tax.map"), str(wd / "reads.fa"),
        str(wd / "oracle"), complevel=1,
    )
    golden_rc = run_oracle_pipeline(
        str(wd / "refs.fa"), str(wd / "tax.map"), str(wd / "reads.fa"),
        str(wd / "oracle_rc"), complevel=1, do_rc=True,
    )
    return {
        "dir": wd,
        "refs": str(wd / "refs.fa"),
        "map": str(wd / "tax.map"),
        "reads": str(wd / "reads.fa"),
        "records": records,
        "golden": golden,
        "golden_rc": golden_rc,
    }
