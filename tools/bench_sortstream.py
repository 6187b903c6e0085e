"""Microbench deciding the round-3 tier-B lookup architecture.

Three candidate ways to beat the measured 2-gather chain (~37ns/probe) at
150M+ entries:

  A) displacement/seed table (VERDICT r2 proposal): cached seed gather whose
     RESULT feeds the t1 index — measures the dependent-gather penalty with a
     genuinely cache-resident first level.
  B) sorted-probe coalescing: if gathers with sorted indices approach cache
     speed, binary-search/merge designs against the raw sorted CTR win.
  C) sort+stream (merge-join): cost = lax.sort of the batch + a full-table
     stream at HBM bandwidth; needs the sort to be cheap.

Run on the real chip: python tools/bench_sortstream.py
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


def timeit(fn, iters=5, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


N_PROBE = 7_798_784  # 65536 reads x 119 windows
SHAPE = (65536, 119)


def bench_sort(rng):
    log("== C) lax.sort cost (the gate for any sort/merge design) ==")
    hi = rng.integers(0, 1 << 31, size=N_PROBE, dtype=np.int64).astype(np.uint32)
    lo = rng.integers(0, 1 << 31, size=N_PROBE, dtype=np.int64).astype(np.uint32)
    pay = np.arange(N_PROBE, dtype=np.uint32)
    hi_d, lo_d, pay_d = map(jax.device_put, (hi, lo, pay))

    @jax.jit
    def sort2(hi, lo, pay):
        h, l, p = jax.lax.sort((hi, lo, pay), num_keys=2)
        return h[::1024].astype(jnp.uint32).sum() + p[::1024].sum()

    dt = timeit(lambda: float(np.asarray(sort2(hi_d, lo_d, pay_d))))
    log(f"sort 7.8M (2xu32 key + u32 payload): {dt*1e3:8.1f} ms  {dt/N_PROBE*1e9:5.2f} ns/el")

    @jax.jit
    def sort1(hi, pay):
        h, p = jax.lax.sort((hi, pay), num_keys=1)
        return h[::1024].astype(jnp.uint32).sum() + p[::1024].sum()

    dt = timeit(lambda: float(np.asarray(sort1(hi_d, pay_d))))
    log(f"sort 7.8M (u32 key + u32 payload):   {dt*1e3:8.1f} ms  {dt/N_PROBE*1e9:5.2f} ns/el")

    # bucket-grade key: 10-bit tile id only (radix-ish need)
    tiny = (hi >> np.uint32(22)).astype(np.uint32)
    tiny_d = jax.device_put(tiny)
    dt = timeit(lambda: float(np.asarray(sort1(tiny_d, pay_d))))
    log(f"sort 7.8M (10-bit key + u32 payload):{dt*1e3:8.1f} ms  {dt/N_PROBE*1e9:5.2f} ns/el")


def bench_coalesced_gather(rng):
    log("== B) gather cost vs index order (24B rows, 3.6GB table) ==")
    rows = 150_000_000
    tbl = jax.device_put(np.ones((rows, 6), np.int32))

    @jax.jit
    def g(tbl, idx):
        return tbl[idx].sum()

    idx_rand = rng.integers(0, rows, size=N_PROBE).astype(np.int32)
    for name, idx in (
        ("random ", idx_rand),
        ("sorted ", np.sort(idx_rand)),
        ("blocked", np.sort(idx_rand.reshape(-1, 8192), axis=1).reshape(-1)),
        ("ident+s", (np.arange(N_PROBE) * (rows // N_PROBE)).astype(np.int32)),
    ):
        d = jax.device_put(idx.reshape(SHAPE))
        dt = timeit(lambda: float(np.asarray(g(tbl, d))))
        log(f"gather {name}: {dt*1e3:8.1f} ms  {dt/N_PROBE*1e9:6.2f} ns/row")
    del tbl


def bench_dependent_cached(rng):
    log("== A) dependent chain with cache-resident seed table ==")
    rows = 150_000_000
    tbl = jax.device_put(np.ones((rows, 6), np.int32))
    for seed_entries in (524_288, 4_194_304, 16_777_216):  # 2MB, 16MB, 64MB
        seeds = jax.device_put(
            rng.integers(0, 256, size=seed_entries).astype(np.int32))
        keys = jax.device_put(
            rng.integers(0, 1 << 31, size=N_PROBE).astype(np.int32).reshape(SHAPE))

        @jax.jit
        def dep(tbl, seeds, keys):
            h1 = (keys.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
            s = seeds[(h1 & jnp.uint32(seed_entries - 1)).astype(jnp.int32)]
            h2 = ((keys.astype(jnp.uint32) ^ s.astype(jnp.uint32)) *
                  jnp.uint32(0x85EBCA6B))
            idx = (h2 % jnp.uint32(rows)).astype(jnp.int32)
            return tbl[idx].sum() + s.sum()

        dt = timeit(lambda: float(np.asarray(dep(tbl, seeds, keys))))
        log(f"seed[{seed_entries//262144/4:5.1f}MB] -> t1 dependent: {dt*1e3:8.1f} ms  "
            f"{dt/N_PROBE*1e9:6.2f} ns/probe")

        @jax.jit
        def indep(tbl, seeds, keys):
            h1 = (keys.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
            s = seeds[(h1 & jnp.uint32(seed_entries - 1)).astype(jnp.int32)]
            h2 = (keys.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
            idx = (h2 % jnp.uint32(rows)).astype(jnp.int32)
            return tbl[idx].sum() + s.sum()

        dt = timeit(lambda: float(np.asarray(indep(tbl, seeds, keys))))
        log(f"seed[{seed_entries//262144/4:5.1f}MB] +  t1 independent: {dt*1e3:6.1f} ms  "
            f"{dt/N_PROBE*1e9:6.2f} ns/probe")
        del seeds


def bench_stream(rng):
    log("== C2) full-table stream + in-register compare (merge-join core) ==")
    # emulate: per batch, stream the whole sorted table once; each streamed
    # tile is reduced against nothing (pure bandwidth read)
    for n in (150_000_000,):
        tbl = jax.device_put(np.ones((n,), np.int32))

        @jax.jit
        def stream(tbl):
            return tbl.astype(jnp.int64).sum()

        dt = timeit(lambda: float(np.asarray(stream(tbl))))
        log(f"stream {n*4/1e9:.1f}GB reduce: {dt*1e3:8.1f} ms "
            f"({n*4/dt/1e9:.0f} GB/s)")
        del tbl


def main():
    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}")
    bench_sort(rng)
    bench_coalesced_gather(rng)
    bench_dependent_cached(rng)
    bench_stream(rng)


if __name__ == "__main__":
    main()
