"""Round-3 build microbench: sort formulation candidates at 128^3/1M.

Candidates vs the production build (ops/celltable.py):
  1. lax.sort pairs num_keys=2 (production) vs num_keys=1 + is_stable
  2. payload carried as sort operands vs payload[perm] row gather
  3. starts via scatter-min + suffix-fill (production) vs
     scatter-add counts + exclusive cumsum

Usage: python scripts/microbench_sort3.py [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.common import cell_of


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(
        nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
        particles_per_cell_axis=1 if grid >= 128 else 2,
    )
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    ncells = nx * ny * nz
    state = jax.device_put(init_state(cfg))
    pos, vel = state.pos, state.vel
    n = pos.shape[0]
    print(f"grid {grid}^3, N={n}, ncells={ncells}")

    m = jnp.array([nx, ny, nz], jnp.float32)
    pc = pos * m
    cell = cell_of(pc)
    lin = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
    idx = jnp.arange(n, dtype=jnp.int32)
    payload = jnp.concatenate(
        [pc, vel, jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 1), jnp.float32)],
        axis=1,
    )
    cols = [payload[:, j] for j in range(8)]

    # --- sort variants ---------------------------------------------------
    lin_s, perm = timeit(
        "A sort pairs num_keys=2", lambda l: jax.lax.sort((l, idx), num_keys=2), lin
    )
    timeit(
        "B sort num_keys=1 stable + idx operand",
        lambda l: jax.lax.sort((l, idx), num_keys=1, is_stable=True),
        lin,
    )
    timeit(
        "C sort pairs + payload[perm] gather",
        lambda l, p: (lambda ls, pm: (ls, p[pm]))(
            *jax.lax.sort((l, idx), num_keys=2)
        ),
        lin,
        payload,
    )
    timeit(
        "D sort stable w/ 8 f32 operands (no gather)",
        lambda l, *c: jax.lax.sort((l,) + c, num_keys=1, is_stable=True),
        lin,
        *cols,
    )
    timeit(
        "E sort stable w/ idx + 8 operands",
        lambda l, *c: jax.lax.sort((l, idx) + c, num_keys=1, is_stable=True),
        lin,
        *cols,
    )
    # payload as 2 packed f32x4 -> bitcast tricks skipped (measured elsewhere)

    # --- starts variants --------------------------------------------------
    def starts_scatter_min_fill(lin_s):
        changes = jnp.concatenate([jnp.ones(1, bool), lin_s[1:] != lin_s[:-1]])
        st = (
            jnp.full(ncells + 1, n, jnp.int32)
            .at[jnp.where(changes, lin_s, ncells)]
            .min(jnp.where(changes, idx, n), mode="drop")
        )
        step = 1
        while step < ncells + 1:
            st = jnp.minimum(st, jnp.pad(st, (0, step), constant_values=n)[step:])
            step *= 2
        return st

    timeit("F starts: scatter-min + suffix fill", starts_scatter_min_fill, lin_s)

    def starts_counts_cumsum(lin):
        counts = jnp.zeros(ncells, jnp.int32).at[lin].add(1, mode="drop")
        return jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]
        )

    timeit("G starts: scatter-add counts + cumsum", starts_counts_cumsum, lin)

    def starts_counts_cumsum_u8(lin):
        # K <= 255 so per-cell counts fit u8: 4x less scatter traffic?
        counts = jnp.zeros(ncells, jnp.uint8).at[lin].add(1, mode="drop")
        return jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts.astype(jnp.int32))]
        )

    timeit("H starts: u8 scatter-add counts + cumsum", starts_counts_cumsum_u8, lin)

    # sanity: F == G on the same data
    f = jax.jit(starts_scatter_min_fill)(lin_s)
    g = jax.jit(starts_counts_cumsum)(lin)
    import numpy as np

    assert np.array_equal(np.asarray(f), np.asarray(g)), "starts variants disagree"
    print("starts variants agree")


if __name__ == "__main__":
    sys.exit(main())
