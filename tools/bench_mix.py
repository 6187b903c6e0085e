"""On-TPU: int32 multiply vs shift/xor cost in the bucket-mix arithmetic."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, iters=8, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 2**31, size=(65536, 128), dtype=np.int32))

    @jax.jit
    def nop(x):
        return x.sum()

    floor = timeit(lambda: float(np.asarray(nop(x))))
    print(f"floor          {floor*1e3:7.1f} ms")

    def u(a):
        return jax.lax.bitcast_convert_type(a, jnp.uint32)

    @jax.jit
    def mul9(a):
        h = u(a)
        for _ in range(9):
            h = h * jnp.uint32(0x9E3779B1)
        return jax.lax.bitcast_convert_type(h, jnp.int32).sum()

    @jax.jit
    def shift27(a):
        h = u(a)
        for _ in range(9):
            h = h ^ (h << jnp.uint32(13))
            h = h ^ (h >> jnp.uint32(17))
            h = h ^ (h << jnp.uint32(5))
        return jax.lax.bitcast_convert_type(h, jnp.int32).sum()

    @jax.jit
    def addshift18(a):
        h = u(a)
        for _ in range(9):
            h = (h + (h << jnp.uint32(6))) ^ (h >> jnp.uint32(11))
        return jax.lax.bitcast_convert_type(h, jnp.int32).sum()

    for name, f in (("9x mul", mul9), ("9x xorshift(3ops)", shift27),
                    ("9x addshift(2ops)", addshift18)):
        t = timeit(lambda: float(np.asarray(f(x))))
        print(f"{name:18s} {t*1e3:7.1f} ms   (-floor {max(0,(t-floor))*1e3:6.1f})")

    # full current canonical key+bucket arithmetic at batch shape (B, 119)
    from utree_tpu.lookup import canonical_keys, canonical_buckets

    qpre = jax.device_put(rng.integers(0, 2**24, size=(65536, 119), dtype=np.int32))
    qhi = jax.device_put(rng.integers(0, 256, size=(65536, 119), dtype=np.int32))
    qlo = jax.device_put(rng.integers(0, 2**31, size=(65536, 119), dtype=np.int32).view(np.uint32))
    valid = jax.device_put(np.ones((65536, 119), bool))

    @jax.jit
    def canon(qpre, qhi, qlo, valid):
        kl, kh, fl = canonical_keys(qpre, qhi, qlo)
        b1, b2 = canonical_buckets(kl, kh, valid, 1 << 27, 1 << 14)
        return b1.sum() + b2.sum() + kl.sum() + kh.sum() + fl.sum()

    t = timeit(lambda: float(np.asarray(canon(qpre, qhi, qlo, valid))))
    print(f"canonical keys+buckets (B,119): {t*1e3:7.1f} ms (-floor {(t-floor)*1e3:6.1f})")


if __name__ == "__main__":
    main()
