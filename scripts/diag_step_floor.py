"""Same-process step FLOOR analysis at 128^3 / 1M particles (TPU).

Times, in ONE process (the tunneled TPU drifts ~1.5x ACROSS processes):
  1. the fused step (with AdvectCache),
  2. each pipeline stage STANDALONE (own jit, realistic inputs produced by
     running the earlier stages once),
  3. the raw primitives each stage's cost decomposes into (lax.sort,
     histogram scatter, 1M-row 512 B / 1 KB gathers).

Purpose: show the fused step is at (or within X% of) the sum of its
stages' measured primitive floors — the step-side analogue of the
renderer's transaction-floor analysis in docs/PERF.md.

Usage (TPU): python scripts/diag_step_floor.py [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import pic_flip_alpha, step_jit


def fetch(x):
    # ONE scalar fetch (first array leaf): each device_get is a blocking
    # tunnel round trip (~7-20 ms), so per-leaf fetches inflate small-op
    # timings by leaves x RTT (measured: a 3-grid elementwise op "cost"
    # 21.7 ms with 3-leaf fetches).  All outputs of one program complete
    # together, so one scalar suffices.
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])
            return


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    t = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:44s} {t:8.2f} ms", flush=True)
    return t


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    dt = jnp.float32(1 / 60)
    state = jax.device_put(init_state(cfg))
    # Warm the state so stage inputs are post-transient (matches bench's
    # 10-step window shape; init cache present).
    for _ in range(3):
        state = step_jit(state, dt, cfg)
    fetch(state)
    print("backend", jax.default_backend(), "grid", grid, flush=True)

    from fluidsimulation_tpu.ops.advect import advect_rk3_cached
    from fluidsimulation_tpu.ops.blur import blur_phi
    from fluidsimulation_tpu.ops.celltable import seed_overflow_correction
    from fluidsimulation_tpu.ops.extrapolate import extrapolate_one_ring
    from fluidsimulation_tpu.ops.flip import flip_update_carry
    from fluidsimulation_tpu.ops.forces import add_gravity
    from fluidsimulation_tpu.ops.levelset import FAR
    from fluidsimulation_tpu.ops.pallas_seed import neighborhood_pass_pallas
    from fluidsimulation_tpu.ops.pallas_sweep import sweep_closest_pallas
    from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_from_super_pallas
    from fluidsimulation_tpu.ops.project import project
    from fluidsimulation_tpu.ops.supertable import (
        build_super_table,
        seed_closest_from_super,
    )

    total = 0.0

    # --- stage standalones (inputs produced by running prior stages once)
    f_adv = jax.jit(lambda c, p: advect_rk3_cached(cfg, c, p, dt))
    pos = f_adv(state.cache, state.pos)
    total += timeit("advect (cached RK3)", f_adv, state.cache, state.pos)

    f_build = jax.jit(lambda p, v: build_super_table(cfg, p, v))
    table = f_build(pos, state.vel)
    total += timeit("build_super_table", f_build, pos, state.vel)

    def seed_chain(tb, p):
        phi0, cpos0 = seed_closest_from_super(cfg, tb, FAR)
        phi0, cpos0 = seed_overflow_correction(cfg, tb, p, phi0, cpos0)
        phi, cpos = neighborhood_pass_pallas(cfg, cpos0)
        phi, _ = sweep_closest_pallas(cfg, phi, cpos)
        return phi

    f_seed = jax.jit(seed_chain)
    phi = f_seed(table, pos)
    total += timeit("seed + overflow + nbhd + 24 sweeps", f_seed, table, pos)

    f_p2g = jax.jit(lambda tb, p, v: p2g_from_super_pallas(cfg, tb, p, v))
    u, v, w, uv, vv, wv = f_p2g(table, pos, state.vel)
    total += timeit("P2G (super Pallas kernel + finish)", f_p2g,
                    table, pos, state.vel)

    f_ext = jax.jit(lambda a, b, c, d, e, f: (
        extrapolate_one_ring(a, b), extrapolate_one_ring(c, d),
        extrapolate_one_ring(e, f)))
    u, v, w = f_ext(u, uv, v, vv, w, wv)
    total += timeit("extrapolate x3", f_ext, u, uv, v, vv, w, wv)

    f_proj = jax.jit(lambda uu, vv_, ww, ph: project(
        cfg, uu, add_gravity(cfg, vv_, dt), ww, ph, dt)[:3])
    un, vn, wn = f_proj(u, v, w, phi)
    total += timeit("gravity + project (rhs+diag+SOR100+apply)",
                    f_proj, u, v, w, phi)

    alpha = pic_flip_alpha(cfg, dt)
    f_flip = jax.jit(lambda p, vl, a, b, c, d, e, f: flip_update_carry(
        cfg, p, vl, a, b, c, d, e, f, alpha, pallas=True))
    total += timeit("FLIP update + next-step cache (pair pack)",
                    f_flip, pos, state.vel, un, vn, wn, u, v, w)

    f_blur = jax.jit(blur_phi)
    total += timeit("blur_phi", f_blur, phi)

    print(f"  {'SUM of standalone stages':44s} {total:8.2f} ms", flush=True)

    # --- fused step (same process)
    t_f = timeit("fused step_jit", lambda s: step_jit(s, dt, cfg), state)
    print(f"  fused / sum = {t_f / total:.3f}", flush=True)

    # --- primitive floors (same process)
    n = state.pos.shape[0]
    key = jax.random.PRNGKey(0)
    lin = jax.random.randint(key, (n,), 0, 524288, dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    timeit("primitive: lax.sort (key,idx) 1M",
           jax.jit(lambda k: jax.lax.sort((k, idx), num_keys=1,
                                          is_stable=True)), lin)
    timeit("primitive: histogram scatter-add 1M -> 512k",
           jax.jit(lambda k: jnp.zeros(524288, jnp.int32).at[k].add(
               1, mode="drop")), lin)
    tbl = jax.random.normal(key, (n, 128), jnp.float32)
    gidx = jax.random.randint(key, (n,), 0, n, dtype=jnp.int32)
    timeit("primitive: 1M x 512B row gather", jax.jit(lambda t, i: t[i]),
           tbl, gidx)
    tbl2 = jax.random.normal(key, (n, 256), jnp.float32)
    timeit("primitive: 1M x 1KB row gather", jax.jit(lambda t, i: t[i]),
           tbl2, gidx)


if __name__ == "__main__":
    main()
