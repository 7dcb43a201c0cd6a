"""Settled-state ground truth: run the EXACT (fast=False, scatter-based)
sim at 128^3 and report y_mean + occupancy histograms, to discriminate
physical compression from table-truncation feedback.

Saves the exact settled state to /tmp/settled{grid}_exact.npz.

Usage: python scripts/diag_exact_settle.py [grid] [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit
from scripts.diag_super import report, fetch


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    dt = 1.0 / 60.0
    state = jax.device_put(init_state(cfg))
    t0 = time.perf_counter()
    for i in range(steps):
        state = step_jit(state, dt, cfg, fast=False)
        if i % 25 == 24:
            fetch(state)
            ym = float(state.pos[:, 1].mean())
            print(f"step {i+1}: y_mean={ym:.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    fetch(state)
    print(f"{steps} exact steps in {time.perf_counter()-t0:.0f}s", flush=True)
    report(cfg, state.pos, "exact-settled")
    np.savez(f"/tmp/settled{grid}_exact.npz",
             pos=np.asarray(state.pos), vel=np.asarray(state.vel))


if __name__ == "__main__":
    sys.exit(main())
