"""Same-process A/B of the supercell APIC table vs the per-cell one
(round 4, ops/apic_super.py) at a ppc_axis=1 config.

Stages timed standalone (jitted, scalar-fetch, best-of-2x5) from the same
warm 5-step state, plus the whole step both ways (the stepper gate forced
per variant by monkeypatching solver.step3d.use_super_table at trace
time).  Only intra-process ratios are trustworthy (CLAUDE.md drift note).

Usage (TPU): python scripts/diag_apic_super.py [grid]
"""

import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.ops.apic import (
    build_apic_table,
    p2g_apic_from_table_fused,
)
from fluidsimulation_tpu.ops.apic_super import (
    build_apic_super_table,
    p2g_apic_from_super_fused,
)
from fluidsimulation_tpu.ops.celltable import (
    seed_closest_from_table,
    seed_overflow_correction,
)
from fluidsimulation_tpu.ops.levelset import FAR
from fluidsimulation_tpu.ops.supertable import seed_closest_from_super
from fluidsimulation_tpu.solver.apic import init_apic_state, step_apic
from fluidsimulation_tpu.solver.step3d import clamp_dt
import fluidsimulation_tpu.solver.step3d as s3


def fetch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    jax.block_until_ready(leaf)
    jax.device_get(leaf.ravel()[0])


def timeit(name, f, *args, n=5, rounds=2, jit=True):
    if jit:
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
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(f"backend {jax.default_backend()}  grid {grid}^3 ppc 1",
          flush=True)
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    assert s3.use_super_table(cfg)
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    s = jax.device_put(init_apic_state(cfg))
    step_new = jax.jit(lambda st: step_apic(st, dt, cfg))
    for _ in range(5):
        s = step_new(s)
    fetch(s.pos)

    t_cell = jax.jit(build_apic_table, static_argnums=0)(
        cfg, s.pos, s.vel, s.C)
    t_sup = jax.jit(build_apic_super_table, static_argnums=0)(
        cfg, s.pos, s.vel, s.C)
    fetch(t_cell.slots)
    fetch(t_sup.slots)
    gb = lambda t: t.slots.size * 4 / 1e9
    print(f"table bytes: cell {gb(t_cell):.2f} GB  super {gb(t_sup):.2f} GB",
          flush=True)

    timeit("build_apic_table (per-cell)",
           lambda st: build_apic_table(cfg, st.pos, st.vel, st.C).slots, s)
    timeit("build_apic_super_table",
           lambda st: build_apic_super_table(cfg, st.pos, st.vel,
                                             st.C).slots, s)

    timeit("seed from cell table (+overflow corr)",
           lambda t, st: seed_overflow_correction(
               cfg, t, st.pos,
               *seed_closest_from_table(cfg, t, FAR))[0], t_cell, s)
    timeit("seed from super table (+overflow corr)",
           lambda t, st: seed_overflow_correction(
               cfg, t, st.pos,
               *seed_closest_from_super(cfg, t, FAR))[0], t_sup, s)

    timeit("p2g fused (per-cell, 54 windows)",
           lambda t, st: p2g_apic_from_table_fused(
               cfg, t, st.pos, st.vel, st.C)[0], t_cell, s)
    timeit("p2g fused (supercell, parity windows)",
           lambda t, st: p2g_apic_from_super_fused(
               cfg, t, st.pos, st.vel, st.C)[0], t_sup, s)

    # Whole step, gate forced per variant at trace time.
    orig = s3.use_super_table
    try:
        s3.use_super_table = lambda c: False
        step_cell = jax.jit(lambda st: step_apic(st, dt, cfg))
        fetch(step_cell(s).pos)  # trace under the forced gate
    finally:
        s3.use_super_table = orig
    # jit=False: re-jitting would RE-TRACE step_apic with the restored
    # gate — time the already-traced executables instead.
    timeit("step_apic (per-cell table)", step_cell, s, jit=False)
    timeit("step_apic (supercell table, shipped gate)", step_new, s,
           jit=False)


if __name__ == "__main__":
    main()
