"""Stage-level A/B of APIC advection variants (round 4).

FINDINGS (TPU v5e, 64^3/953k, same process):

  advect_rk3 packed                52.5 ms
  advect_rk3_cached                38.6 ms   (k1 from a carried cache)
  g2p_apic_packed                  47.4 ms
  g2p_apic_packed with_hat         54.2 ms   (+6.8: a third full pass
                                              over the 1.1 GB/comp rows)
  with_hat + pack_mac3             56.2 ms   (the full carry cost ~8.9)
  p2g fused, z-slices in loop      32.6 ms
  p2g fused, aligned slab hoist    35.4 ms   (barrier adds 4-slab copies;
                                              XLA has no Mosaic relayout
                                              pathology — hoist NEGATIVE)
  step cached vs uncached          179.7 vs 184.5 ms (net +5 only)

Consequence: the FLIP-style AdvectCache carry is NOT worth it for APIC
(14 ms advect saving - 9 ms carry cost).  advect_rk3_pic (stage 1 =
state.vel, exact for pure-PIC transfers since vel IS the spline sample
at pos) takes the full 14 ms with zero carry — it is the stepper's
advection since round 4.  The earlier bench_apic cached-slower reading
(258 vs 214) was cross-loop machine-state drift; this script interleaves
variants in one process.

The cache/with_hat variants are re-constructed inline here so the A/B
stays reproducible against the current code.

Usage (TPU): python scripts/diag_apic_cache_ab.py [grid] [ppc]
"""

import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.interp_packed import (
    interp_mac3_packed_vec,
    pack_mac3,
)
from fluidsimulation_tpu.core.state import AdvectCache
from fluidsimulation_tpu.ops.advect import (
    advect_rk3,
    advect_rk3_cached,
    advect_rk3_pic,
)
from fluidsimulation_tpu.ops.apic import g2p_apic_packed
from fluidsimulation_tpu.solver.apic import init_apic_state, step_apic_jit
from fluidsimulation_tpu.solver.step3d import clamp_dt


def fetch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    jax.block_until_ready(leaf)
    jax.device_get(leaf.ravel()[0])


def timeit(name, f, *args, n=5, rounds=2):
    f = jax.jit(f)
    out = f(*args)
    fetch(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:52s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    args = [int(a) for a in sys.argv[1:3]]
    grid = args[0] if args else 64
    ppc = args[1] if len(args) > 1 else (2 if grid <= 64 else 1)
    print(f"backend {jax.default_backend()}  grid {grid}^3 ppc {ppc}",
          flush=True)
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    dims = (cfg.nx, cfg.ny, cfg.nz)
    m = jnp.array(dims, jnp.float32)
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    s = jax.device_put(init_apic_state(cfg))
    for _ in range(5):
        s = step_apic_jit(s, dt, cfg)
    fetch(s.pos)

    def make_cache(st):
        pn = pack_mac3(st.u, st.v, st.w)
        k1 = interp_mac3_packed_vec(*pn, dims, st.pos * m)
        return AdvectCache(k1=k1, pu=pn[0], pv=pn[1], pw=pn[2])

    cache = jax.jit(make_cache)(s)
    fetch(cache.k1)

    timeit("advect_rk3 packed",
           lambda st: advect_rk3(cfg, st.u, st.v, st.w, st.pos, dt), s)
    timeit("advect_rk3_cached",
           lambda st, c: advect_rk3_cached(cfg, c, st.pos, dt), s, cache)
    timeit("advect_rk3_pic (the stepper's form)",
           lambda st: advect_rk3_pic(cfg, st.u, st.v, st.w, st.pos,
                                     st.vel, dt), s)

    timeit("g2p_apic_packed",
           lambda st: g2p_apic_packed(cfg, st.pos, st.u, st.v, st.w), s)
    timeit("g2p_apic_packed with_hat",
           lambda st: g2p_apic_packed(cfg, st.pos, st.u, st.v, st.w,
                                      with_hat=True), s)

    # P2G union-window form: lane-aligned slab hoist A/B.
    from fluidsimulation_tpu.ops.apic import (
        build_apic_table,
        p2g_apic_from_table_fused,
    )

    table = jax.jit(build_apic_table, static_argnums=0)(cfg, s.pos, s.vel,
                                                        s.C)
    fetch(table.slots)
    timeit("p2g fused (z-shift slices in loop, default)",
           lambda t, st: p2g_apic_from_table_fused(
               cfg, t, st.pos, st.vel, st.C, aligned_slabs=False)[0],
           table, s)
    timeit("p2g fused (aligned slab hoist)",
           lambda t, st: p2g_apic_from_table_fused(
               cfg, t, st.pos, st.vel, st.C, aligned_slabs=True)[0],
           table, s)

    timeit("step (advect_rk3_pic)",
           lambda st: step_apic_jit(st, dt, cfg), s, n=8)


if __name__ == "__main__":
    main()
