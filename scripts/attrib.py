"""Fused-step attribution by cumulative-prefix jits.

Times jit(P_k) where P_k = first k pipeline stages (fast path, exactly as
solver/step3d.py composes them); marginal cost of stage k = T_k - T_{k-1},
WITH cross-stage fusion effects included — unlike per-stage dispatch timing
(utils/profiling.py), which pays a ~47 ms dispatch/fetch floor per stage in
this tunneled environment.

Usage: python scripts/attrib.py [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import (
    pic_flip_alpha,
    step_jit,
    use_pallas_kernels,
)


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, n=5):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / n


def build_prefixes(cfg, use_pallas):
    from fluidsimulation_tpu.ops.advect import advect_rk3
    from fluidsimulation_tpu.ops.blur import blur_phi
    from fluidsimulation_tpu.ops.celltable import (
        build_cell_table,
        p2g_from_table,
        seed_closest_from_table,
        seed_overflow_correction,
    )
    from fluidsimulation_tpu.ops.extrapolate import extrapolate_one_ring
    from fluidsimulation_tpu.ops.flip import flip_update
    from fluidsimulation_tpu.ops.forces import add_gravity
    from fluidsimulation_tpu.ops.levelset import FAR, neighborhood_pass, sweep_closest
    from fluidsimulation_tpu.ops.project import project
    from fluidsimulation_tpu.ops.supertable import (
        build_super_table,
        p2g_from_super,
        seed_closest_from_super,
    )
    from fluidsimulation_tpu.solver.step3d import use_super_table

    use_super = use_super_table(cfg)

    def upto(k):
        def fn(state, dt):
            if state.cache is not None:
                from fluidsimulation_tpu.ops.advect import advect_rk3_cached

                pos = advect_rk3_cached(cfg, state.cache, state.pos, dt)
            else:
                pos = advect_rk3(
                    cfg, state.u, state.v, state.w, state.pos, dt
                )
            if k == 0:
                return pos
            if use_super:
                table = build_super_table(cfg, pos, state.vel)
            else:
                table = build_cell_table(cfg, pos, state.vel)
            if k == 1:
                return table
            if use_super:
                phi0, cpos0 = seed_closest_from_super(cfg, table, FAR)
            else:
                phi0, cpos0 = seed_closest_from_table(cfg, table, FAR)
            phi0, cpos0 = seed_overflow_correction(cfg, table, pos, phi0, cpos0)
            if use_pallas:
                from fluidsimulation_tpu.ops.pallas_seed import neighborhood_pass_pallas

                phi, cpos = neighborhood_pass_pallas(cfg, cpos0)
            else:
                phi, cpos = neighborhood_pass(cfg, cpos0)
            if k == 2:
                return phi, cpos
            if use_pallas:
                from fluidsimulation_tpu.ops.pallas_sweep import sweep_closest_pallas

                phi, cpos = sweep_closest_pallas(cfg, phi, cpos)
            else:
                phi, cpos = sweep_closest(cfg, phi, cpos)
            if k == 3:
                return phi, cpos
            if use_super and use_pallas and (cfg.ny // 2) % 8 == 0:
                from fluidsimulation_tpu.ops.pallas_p2g_super import (
                    p2g_from_super_pallas,
                )

                u, v, w, uv, vv, wv = p2g_from_super_pallas(cfg, table, pos, state.vel)
            elif use_super:
                u, v, w, uv, vv, wv = p2g_from_super(cfg, table, pos, state.vel)
            elif use_pallas:
                from fluidsimulation_tpu.ops.pallas_p2g import (
                    p2g_fits_vmem,
                    p2g_from_table_pallas,
                )

                if p2g_fits_vmem(cfg, table.slots.shape[2]):
                    u, v, w, uv, vv, wv = p2g_from_table_pallas(
                        cfg, table, pos, state.vel
                    )
                else:
                    u, v, w, uv, vv, wv = p2g_from_table(cfg, table, pos, state.vel)
            else:
                u, v, w, uv, vv, wv = p2g_from_table(cfg, table, pos, state.vel)
            if k == 4:
                return u, v, w, uv, vv, wv, phi
            u = extrapolate_one_ring(u, uv)
            v = extrapolate_one_ring(v, vv)
            w = extrapolate_one_ring(w, wv)
            if k == 5:
                return u, v, w, phi
            old = (u, v, w)
            v = add_gravity(cfg, v, dt)
            u, v, w, _ = project(cfg, u, v, w, phi, dt)
            if k == 6:
                return u, v, w, phi
            alpha = pic_flip_alpha(cfg, dt)
            if state.cache is not None:
                from fluidsimulation_tpu.ops.flip import flip_update_carry

                vel, _cache = flip_update_carry(
                    cfg, pos, state.vel, u, v, w, *old, alpha
                )
            else:
                vel = flip_update(cfg, pos, state.vel, u, v, w, *old, alpha)
            phi = blur_phi(phi)
            return pos, vel, u, v, w, phi

        return jax.jit(fn)

    return upto


NAMES = [
    "advect",
    "table build",
    "seed (+overflow+nbhd)",
    "24 sweeps",
    "p2g",
    "extrapolate x3",
    "project (rhs+diag+sor+apply)",
    "flip + blur",
]


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(
        nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
        particles_per_cell_axis=1 if grid >= 128 else 2,
    )
    up = use_pallas_kernels(cfg)
    print(f"backend {jax.default_backend()}, grid {grid}^3, "
          f"particles {cfg.num_particles}, pallas={up}")
    dt = jnp.float32(1 / 60)
    state = jax.device_put(init_state(cfg))
    state = step_jit(state, dt, cfg)
    fetch(state)
    state = step_jit(state, dt, cfg)  # profile a "typical" state
    fetch(state)

    upto = build_prefixes(cfg, up)
    prev = 0.0
    for k in range(8):
        t = timeit(upto(k), state, dt)
        print(f"  upto {NAMES[k]:34s} {t*1e3:8.1f} ms   (marginal {1e3*(t-prev):7.1f})",
              flush=True)
        prev = t
    full = timeit(lambda s: step_jit(s, dt, cfg), state)
    print(f"  fused step_jit                       {full*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
