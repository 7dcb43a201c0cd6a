"""Measure pack_mac3_combined_pallas vs XLA pack at 128^3 on TPU."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.interp_combined import pack_mac3_combined
from fluidsimulation_tpu.core.pallas_pack import pack_mac3_combined_pallas
from fluidsimulation_tpu.core.interp_packed import pack_mac3


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=5):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    fetch(out)
    print(f"{name:44s} compile+1 {time.perf_counter()-t0:7.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)
    return out


def main():
    nx = ny = nz = 128
    key = jax.random.PRNGKey(0)
    ku, kv, kw = jax.random.split(key, 3)
    u = jax.random.normal(ku, (nx + 1, ny, nz), jnp.float32)
    v = jax.random.normal(kv, (nx, ny + 1, nz), jnp.float32)
    w = jax.random.normal(kw, (nx, ny, nz + 1), jnp.float32)
    u, v, w = jax.device_put((u, v, w))

    tp = timeit("pallas pack", pack_mac3_combined_pallas, u, v, w)
    timeit("XLA combined pack", pack_mac3_combined, u, v, w)
    timeit("interp_packed pack_mac3 (baseline)", pack_mac3, u, v, w)

    tx = jax.jit(pack_mac3_combined)(u, v, w)
    diff = jax.device_get(jnp.max(jnp.abs(tp - tx)))
    print("max |pallas - xla| =", diff, flush=True)


if __name__ == "__main__":
    main()
