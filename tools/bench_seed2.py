"""Follow-up microbench: scalar-gather economics for the displacement hash.

bench_sortstream.py measured a DEPENDENT chain (scalar seed gather -> 24B row
gather) at the same 26ns as the row gather alone, even with a 64MB seed
table.  Before committing to the seeded design, pin down:
  1. scalar (1 int32) gather cost alone, big table;
  2. whether multiple independent scalar gathers sum or overlap;
  3. the full displacement probe shape: seed scalar (u8 packed in int32) ->
     dependent 24B 2-slot row gather + compares, at 150M-entry scale;
  4. same with a 48B 4-slot t1 for comparison.
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


N_PROBE = 7_798_784
SHAPE = (65536, 119)


def main():
    rng = np.random.default_rng(1)
    log(f"devices: {jax.devices()}")

    big_n = 900_000_000  # 3.6GB of int32
    flat = jax.device_put(np.ones(big_n, np.int32))
    keys = jax.device_put(
        rng.integers(0, 1 << 31, size=N_PROBE).astype(np.int32).reshape(SHAPE))

    def mk(n_gathers):
        @jax.jit
        def f(flat, keys):
            acc = jnp.zeros(keys.shape, jnp.int32)
            for g in range(n_gathers):
                h = (keys.astype(jnp.uint32) * jnp.uint32(0x9E3779B1 + 2 * g + 1))
                idx = (h % jnp.uint32(big_n)).astype(jnp.int32)
                acc = acc + flat[idx]
            return acc.sum()
        return f

    for n_g in (1, 2, 3, 6):
        f = mk(n_g)
        dt = timeit(lambda: float(np.asarray(f(flat, keys))))
        log(f"{n_g} indep scalar gathers (3.6GB): {dt*1e3:8.1f} ms  "
            f"{dt/N_PROBE*1e9:6.2f} ns/probe  ({dt/N_PROBE/n_g*1e9:5.2f}/gather)")
    del flat

    # full displacement probe shape at 150M entries: packed-u8 seed scalar ->
    # dependent 2-slot row gather + both-slot compare + value select
    n_entries = 150_000_000
    slots = n_entries * 5 // 3  # load 0.6
    rows = slots // 2
    t1 = jax.device_put(np.ones((rows, 6), np.int32))
    seeds32 = jax.device_put(np.ones(n_entries // 4 // 4, np.int32))  # u8 x4, lambda=4
    nseed = n_entries // 4

    @jax.jit
    def probe(t1, seeds32, keys):
        u = keys.astype(jnp.uint32)
        h1 = u * jnp.uint32(0x9E3779B1)
        bkt = (h1 % jnp.uint32(nseed)).astype(jnp.int32)
        word = seeds32[bkt >> 2]
        seed = (word >> ((bkt & 3) * 8)) & 0xFF
        h2 = (u ^ seed.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)) * jnp.uint32(0xC2B2AE35)
        slot = (h2 % jnp.uint32(slots)).astype(jnp.int32)
        row = t1[slot >> 1]
        m0 = (row[..., 0] == keys) & (row[..., 1] == keys)
        m1 = (row[..., 3] == keys) & (row[..., 4] == keys)
        v = jnp.where(m0, row[..., 2], jnp.where(m1, row[..., 5], 0))
        return v.sum()

    dt = timeit(lambda: float(np.asarray(probe(t1, seeds32, keys))))
    log(f"displacement probe (u8-seed scalar -> 24B row, 150M): {dt*1e3:8.1f} ms  "
        f"{dt/N_PROBE*1e9:6.2f} ns/probe")
    del t1

    rows4 = slots // 4
    t1w = jax.device_put(np.ones((rows4, 12), np.int32))

    @jax.jit
    def probe48(t1w, seeds32, keys):
        u = keys.astype(jnp.uint32)
        h1 = u * jnp.uint32(0x9E3779B1)
        bkt = (h1 % jnp.uint32(nseed)).astype(jnp.int32)
        word = seeds32[bkt >> 2]
        seed = (word >> ((bkt & 3) * 8)) & 0xFF
        h2 = (u ^ seed.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)) * jnp.uint32(0xC2B2AE35)
        slot = (h2 % jnp.uint32(slots)).astype(jnp.int32)
        row = t1w[slot >> 2]
        v = jnp.zeros(keys.shape, jnp.int32)
        for s in range(4):
            m = (row[..., 3 * s] == keys) & (row[..., 3 * s + 1] == keys)
            v = jnp.where(m, row[..., 3 * s + 2], v)
        return v.sum()

    dt = timeit(lambda: float(np.asarray(probe48(t1w, seeds32, keys))))
    log(f"displacement probe (seed -> 48B row, 150M):           {dt*1e3:8.1f} ms  "
        f"{dt/N_PROBE*1e9:6.2f} ns/probe")

    # SoA alternative: per-key single slot, 3 scalar gathers at one index
    del t1w
    klo = jax.device_put(np.ones(slots, np.int32))
    khi = jax.device_put(np.ones(slots, np.int32))
    val = jax.device_put(np.ones(slots, np.int32))

    @jax.jit
    def probe_soa(klo, khi, val, seeds32, keys):
        u = keys.astype(jnp.uint32)
        h1 = u * jnp.uint32(0x9E3779B1)
        bkt = (h1 % jnp.uint32(nseed)).astype(jnp.int32)
        word = seeds32[bkt >> 2]
        seed = (word >> ((bkt & 3) * 8)) & 0xFF
        h2 = (u ^ seed.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)) * jnp.uint32(0xC2B2AE35)
        slot = (h2 % jnp.uint32(slots)).astype(jnp.int32)
        m = (klo[slot] == keys) & (khi[slot] == keys)
        return jnp.where(m, val[slot], 0).sum()

    dt = timeit(lambda: float(np.asarray(probe_soa(klo, khi, val, seeds32, keys))))
    log(f"displacement probe SoA (seed -> 3 scalar gathers):    {dt*1e3:8.1f} ms  "
        f"{dt/N_PROBE*1e9:6.2f} ns/probe")


if __name__ == "__main__":
    main()
