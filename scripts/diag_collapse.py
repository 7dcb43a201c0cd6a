"""Discriminate the settled-state volume collapse at 128^3/ppc=1:
(a) under-seeding (ppc=1 -> number-fluctuation holes read as air), vs
(b) SOR under-convergence at 128^3, vs (c) a solver bug at any scale.

Probes (exact slow path, fast=False):
  A: 64^3 ppc=2 (the reference demo config) - collapse here = (c).
  B: 128^3 ppc=1 with sor=400 - fixed by iterations = (b).

Prints y_mean, post-projection fluid max|div|, fluid-cell count, and the
per-cell occupancy tail (collapse shows up as cells with >>8 particles).

Usage: python scripts/diag_collapse.py A|B [steps]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.common import cell_of
from fluidsimulation_tpu.solver.step3d import step_jit


def occupancy_tail(cfg, pos):
    m = jnp.array([cfg.nx, cfg.ny, cfg.nz], jnp.float32)
    cell = cell_of(pos * m)
    lin = (cell[:, 0] * cfg.ny + cell[:, 1]) * cfg.nz + cell[:, 2]
    counts = jnp.zeros(cfg.nx * cfg.ny * cfg.nz, jnp.int32).at[lin].add(
        1, mode="drop")
    return int(counts.max()), int((counts >= 17).sum())


def run(tag, cfg, steps, dt, every=25):
    s = jax.device_put(init_state(cfg))
    print(f"{tag}: N={cfg.num_particles}", flush=True)
    t0 = time.perf_counter()
    for i in range(steps):
        s = step_jit(s, dt, cfg, fast=False)
        if i % every == every - 1:
            ym = float(s.pos[:, 1].mean())
            div = (s.u[1:] - s.u[:-1]) + (s.v[:, 1:] - s.v[:, :-1]) + (
                s.w[:, :, 1:] - s.w[:, :, :-1]
            )
            fluid = s.phi < 0.0
            mdiv = float(jnp.abs(jnp.where(fluid, div, 0.0)).max())
            nfluid = int(fluid.sum())
            mx, tail = occupancy_tail(cfg, s.pos)
            print(
                f"  {tag} step {i+1}: y_mean={ym:.4f} max|div|={mdiv:.3e} "
                f"fluid_cells={nfluid} max_occ={mx} cells>=17: {tail} "
                f"({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
    return s


which = sys.argv[1] if len(sys.argv) > 1 else "A"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150
dt = 1 / 60

if which == "A":
    run("A 64^3 ppc2 sor100", SimConfig(nx=64, ny=64, nz=64,
        cells_per_meter=64.0), steps, dt)
elif which == "B":
    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1, sor_iterations=400)
    run("B 128^3 ppc1 sor400", cfg, steps, dt)
