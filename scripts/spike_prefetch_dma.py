"""SPIKE: does a data-dependent BlockSpec index_map (scalar prefetch) work on
this axon TPU runtime?  Round-1 found manual make_async_copy with dynamic
slices CRASHES the worker; Element-indexed specs with STATIC maps work.  This
tests the in-between: auto-pipelined blocks whose start offsets come from a
prefetched scalar array (the standard PrefetchScalarGridSpec pattern).

Kernel: out[i] = payload[starts[i] : starts[i]+CAP] — a per-tile windowed
copy, the core of a CSR->dense placement pass.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    jax.device_get(x.ravel()[0])


CAP = 256
NLINES = 16384
N = 1_000_188


def main():
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.standard_normal((N + CAP, 8)).astype(np.float32))
    starts = jnp.asarray(
        np.sort(rng.integers(0, N, NLINES)).astype(np.int32)
    )

    def kernel(starts_ref, pay_ref, out_ref):
        out_ref[0, :, :] = pay_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NLINES,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(CAP), pl.Element(8)),
                lambda i, starts: (starts[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, CAP, 8), lambda i, starts: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def run(starts, payload):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NLINES, CAP, 8), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(starts, payload)

    f = jax.jit(run)
    out = f(starts, payload)
    fetch(out)
    want = np.stack([np.asarray(payload)[s : s + CAP] for s in np.asarray(starts)[:4]])
    np.testing.assert_allclose(np.asarray(out[:4]), want)
    print("CORRECT", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(starts, payload)
    fetch(out)
    print(f"prefetch-DMA windowed copy: {(time.perf_counter()-t0)/10*1e3:.2f} ms "
          f"({NLINES} blocks of {CAP*32} B)", flush=True)


if __name__ == "__main__":
    main()
