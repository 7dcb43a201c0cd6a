"""Round-2b micro-measurements: advect internals + build alternates."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.core.interp_packed import interp_mac3_packed_vec, pack_mac3
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
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)
    return out


def main():
    grid = 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    state = jax.device_put(init_state(cfg))
    m = jnp.array([grid] * 3, jnp.float32)
    nx = ny = nz = grid

    # -- advect internals --
    packs = timeit("pack_mac3 (3 tables)",
                   lambda s: pack_mac3(s.u, s.v, s.w), state)
    pu, pv, pw = packs
    timeit("interp_packed 1 stage (3 gathers + hats)",
           lambda s: interp_mac3_packed_vec(pu, pv, pw, (nx, ny, nz), s.pos * m),
           state)
    timeit("interp_packed 3 dependent stages",
           lambda s: interp_mac3_packed_vec(
               pu, pv, pw, (nx, ny, nz),
               interp_mac3_packed_vec(
                   pu, pv, pw, (nx, ny, nz),
                   interp_mac3_packed_vec(pu, pv, pw, (nx, ny, nz), s.pos * m)
                   * 0.01 + s.pos * m,
               ) * 0.01 + s.pos * m,
           ), state)

    # -- build alternates --
    n = cfg.num_particles
    idx = jnp.arange(n, dtype=jnp.int32)
    pc = state.pos * m
    cell = cell_of(pc)
    lin = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
    ncells = nx * ny * nz

    timeit("sort num_keys=2", lambda l: jax.lax.sort((l, idx), num_keys=2), lin)
    timeit("sort num_keys=1 stable",
           lambda l: jax.lax.sort((l, idx), num_keys=1, is_stable=True), lin)
    lin_s, perm = jax.lax.sort((lin, idx), num_keys=2)

    def starts_fill(lin_s):
        changes = jnp.concatenate([jnp.ones(1, bool), lin_s[1:] != lin_s[:-1]])
        st = (
            jnp.full(ncells + 1, n, jnp.int32)
            .at[jnp.where(changes, lin_s, ncells)]
            .min(jnp.where(changes, idx, n), mode="drop")
        )
        k = 1
        while k < ncells + 1:
            st = jnp.minimum(st, jnp.pad(st, (0, k), constant_values=n)[k:])
            k *= 2
        return st

    timeit("starts: scatter-min + suffix fill", starts_fill, lin_s)

    def starts_cumsum(lin_s):
        counts = jnp.zeros(ncells, jnp.int32).at[lin_s].add(1, mode="drop")
        return jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]
        )

    timeit("starts: counts scatter-add + cumsum", starts_cumsum, lin_s)

    def starts_boundary_cumsum(lin_s):
        # scatter run-starts then max-fill forward via cumsum trick:
        # counts diff approach with one scatter of run lengths
        changes = jnp.concatenate([jnp.ones(1, bool), lin_s[1:] != lin_s[:-1]])
        counts = jnp.zeros(ncells, jnp.int32).at[
            jnp.where(changes, lin_s, ncells)
        ].add(0, mode="drop")  # placeholder; boundary-only scatter cost probe
        return counts

    timeit("boundary-only scatter probe", starts_boundary_cumsum, lin_s)


if __name__ == "__main__":
    main()
