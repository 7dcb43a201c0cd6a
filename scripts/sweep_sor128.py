"""128^3 SOR-iterations vs divergence/volume sweep (VERDICT r2 item 5).

The reference tuned omega and fixed 100 iterations at 64^3
(Simulation3D.cpp:922-944); this records what a healthy 128^3 run needs:
for each sor_iterations setting, soak `steps` steps and report the
post-projection divergence (max + L2, FluidSim3::PrintDivergence
semantics) and the volume proxies (particle y-mean, fluid-cell count).

Usage: python scripts/sweep_sor128.py [grid] [steps] [iters,iters,...]
       [ppc] [dt]

The dt arg exists because the resolution sweep is really a CFL sweep: the
reference's demo dt (1/60 s at 64^3) doubles in cell units at 128^3; a
volume-holding 128^3 run wants dt scaled with the grid (1/120).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.reference.solver3d import divergence_stats
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    iters = ([int(x) for x in sys.argv[3].split(",")]
             if len(sys.argv) > 3 else [100, 200, 400])
    ppc = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    dt = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0 / 60.0

    for it in iters:
        cfg = SimConfig(
            nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
            particles_per_cell_axis=ppc, sor_iterations=it,
        )
        state = jax.device_put(init_state(cfg))
        t0 = time.perf_counter()
        checkpoints = sorted({steps // 4, steps // 2, steps})
        done = 0
        for ck in checkpoints:
            for _ in range(ck - done):
                state = step_jit(state, dt, cfg)
            done = ck
            fetch(state.pos)
            l2, mx, _ = divergence_stats(
                cfg, np.asarray(state.u), np.asarray(state.v),
                np.asarray(state.w), np.asarray(state.phi),
            )
            ymean = float(state.pos[:, 1].mean())
            fluid = int((state.phi < 0).sum())
            print(f"iters {it:4d} step {ck:4d}: div L2 {float(l2):9.4f} "
                  f"max {float(mx):8.4f}  y_mean {ymean:.4f}  "
                  f"fluid_cells {fluid}", flush=True)
        el = time.perf_counter() - t0
        assert np.isfinite(np.asarray(state.vel)).all()
        print(f"iters {it:4d}: {steps} steps in {el:.1f}s "
              f"({steps/el:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
