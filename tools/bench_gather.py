"""Microbench: random row-gather cost vs row width/alignment on the TPU.

Tests the hypothesis that 6-col (24B) rows straddle 32B sectors and gather
slower than 8-col (32B, sector-aligned) rows.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, flush=True)


def timeit(fn, iters=6, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    n_idx = 7_798_784  # one batch worth of probes (65536 x 119)
    rows = 134_217_728  # c1 bucket count at the 20M-kmer bench shape

    idx = rng.integers(0, rows, size=n_idx).astype(np.int32).reshape(65536, 119)
    idx_d = jax.device_put(idx)

    # sync-floor: trivial jit
    @jax.jit
    def nop(x):
        return x.sum()

    floor = timeit(lambda: float(np.asarray(nop(idx_d))))
    log(f"sync floor (sum of idx): {floor*1e3:8.1f} ms")

    for cols in (6, 8, 4, 3):
        tbl = jax.device_put(np.ones((rows, cols), np.int32))

        @jax.jit
        def g(tbl, idx):
            r = tbl[idx]  # (B, W, cols)
            return r.sum()

        dt = timeit(lambda: float(np.asarray(g(tbl, idx_d))))
        log(f"gather rows={rows} cols={cols} ({cols*4}B): {dt*1e3:8.1f} ms  "
            f"{(dt-floor)/n_idx*1e9:6.2f} ns/row")
        del tbl

    # two sequential gathers 8-col (t1+t2 pattern, t2 small)
    tbl8 = jax.device_put(np.ones((rows, 8), np.int32))
    t2 = jax.device_put(np.ones((16384, 48), np.int32))
    idx2 = jax.device_put((idx % 16384))

    @jax.jit
    def g2(tbl, t2, i1, i2):
        return tbl[i1].sum() + t2[i2].sum()

    dt = timeit(lambda: float(np.asarray(g2(tbl8, t2, idx_d, idx2))))
    log(f"8-col 3GB + 48-col 3MB:  {dt*1e3:8.1f} ms  {(dt-floor)/n_idx*1e9:6.2f} ns/pos")

    # slot compare chain on top (2 slots, like canonical probe)
    @jax.jit
    def g3(tbl, t2, i1, i2):
        r = tbl[i1]
        v = jnp.zeros(i1.shape, jnp.int32)
        for s in range(2):
            m = (r[..., s * 3] == 1) & (r[..., s * 3 + 1] == 2) & (r[..., s * 3 + 2] != 0)
            v = jnp.where(m, r[..., s * 3 + 2], v)
        r2 = t2[i2]
        for s in range(16):
            m = (r2[..., s * 3] == 1) & (r2[..., s * 3 + 1] == 2) & (r2[..., s * 3 + 2] != 0)
            v = jnp.where(m, r2[..., s * 3 + 2], v)
        return v.sum()

    dt = timeit(lambda: float(np.asarray(g3(tbl8, t2, idx_d, idx2))))
    log(f"+ slot compare chains:   {dt*1e3:8.1f} ms  {(dt-floor)/n_idx*1e9:6.2f} ns/pos")


if __name__ == "__main__":
    main()
