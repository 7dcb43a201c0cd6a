"""Micro-benchmarks for individual pipeline ops on the live backend.

Methodology: enqueue N iterations of the jitted op (outputs chained where
possible), then force completion with a scalar host fetch; per-op time =
(total - fetch_floor) / N.  This sidesteps the tunneled platform's broken
block_until_ready.

Usage: python scripts/microbench.py [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops import advect, binning, extrapolate, flip, forces, levelset, p2g, project
from fluidsimulation_tpu.ops.blur import blur_phi
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    leaves = jax.tree.leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    fetch(out)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1e3:9.2f} ms")
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(
        nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
        particles_per_cell_axis=1 if grid >= 128 else 2,
    )
    print(f"grid {grid}^3, particles {cfg.num_particles}")
    state = jax.device_put(init_state(cfg))
    dt = jnp.float32(1 / 60)
    state = step_jit(state, dt, cfg)
    fetch(state)

    J = lambda f: jax.jit(f, static_argnums=0)
    u, v, w, pos, vel = state.u, state.v, state.w, state.pos, state.vel

    timeit("advect_rk3", J(advect.advect_rk3), cfg, u, v, w, pos, dt)
    counts, start, bpos, bvel, order = timeit(
        "bin_particles", J(binning.bin_particles), cfg, pos, vel
    )
    phi0, cpos0 = timeit("seed_closest", J(levelset.seed_closest), cfg, bpos)
    phi, cpos = timeit("sweep_closest(24)", J(levelset.sweep_closest), cfg, phi0, cpos0)
    tg = timeit("p2g transfer", J(p2g.transfer_to_grid), cfg, bpos, bvel)
    gu, gv, gw, uv, vv, wv = tg
    timeit("extrapolate x3", jax.jit(lambda u_, uv_, v_, vv_, w_, wv_: (
        extrapolate.extrapolate_one_ring(u_, uv_),
        extrapolate.extrapolate_one_ring(v_, vv_),
        extrapolate.extrapolate_one_ring(w_, wv_),
    )), gu, uv, gv, vv, gw, wv)
    timeit("add_gravity", J(forces.add_gravity), cfg, gv, dt)
    b = timeit("project_rhs", J(project.compute_rhs), cfg, gu, gv, gw, dt)
    diag = timeit("project_diag", J(project.compute_diag), cfg, phi)
    p = timeit("sor x100", J(project.sor_pressure), cfg, phi, diag, b)
    timeit("apply_pressure", J(project.apply_pressure), cfg, gu, gv, gw, p, phi, dt)
    timeit("flip_update", J(flip.flip_update), cfg, bpos, bvel, gu, gv, gw, u, v, w, 0.01)
    timeit("blur", jax.jit(blur_phi), phi)
    timeit("FULL STEP", lambda s: step_jit(s, dt, cfg), state, n=3)


if __name__ == "__main__":
    main()
