"""Gather cost vs row width on the live backend.

rows[key] where rows is (M, L) f32 and key is (Q,) int32 random.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    jax.device_get(x.ravel()[0])


def timeit(fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    M = 2_097_152
    for Q in (1_000_188, 2_097_152):
        key = jnp.asarray(rng.integers(0, M, Q).astype(np.int32))
        key_sorted = jnp.sort(key)
        for L in (8, 16, 32, 40, 64, 128, 256):
            tab = jnp.asarray(rng.standard_normal((M, L)).astype(np.float32))
            t = timeit(lambda k, tb: tb[k].sum(1), key, tab)
            ts = timeit(lambda k, tb: tb[k].sum(1), key_sorted, tab)
            print(
                f"Q={Q:9d} L={L:4d} ({L*4:5d}B) "
                f"rand {t*1e3:8.2f} ms ({t/Q*1e9:6.2f} ns/row)   "
                f"sorted {ts*1e3:8.2f} ms ({ts/Q*1e9:6.2f} ns/row)",
                flush=True,
            )
            del tab


if __name__ == "__main__":
    main()
