"""Per-step wall times of a fused-step config (one process).

Settled round 4: the 7864 ms profile_fast reading at the physical 128^3
config was ONE ~39 s tunnel stall on the first post-compile execution
amortized over a 5-step loop; steady state is ~940 ms/step.  Per-step
timing makes such stalls visible instead of folding them into averages.

Usage (TPU): python scripts/diag_phys_steps.py [n_steps] [grid] [ppc]
"""

import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit, overflow_count


def fetch(s):
    jax.block_until_ready(s)
    jax.device_get(s.vel.ravel()[0])


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    ppc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    dt = jnp.float32(1 / 120)
    print(f"backend {jax.default_backend()}  N={cfg.num_particles}",
          flush=True)
    state = jax.device_put(init_state(cfg))
    state = step_jit(state, dt, cfg)  # compile
    fetch(state)
    for i in range(n_steps):
        t0 = time.perf_counter()
        state = step_jit(state, dt, cfg)
        fetch(state)
        ms = (time.perf_counter() - t0) * 1e3
        n_over = int(overflow_count(state.pos, cfg))
        print(f"step {i + 2:3d}: {ms:8.1f} ms   n_overflow={n_over}",
              flush=True)


if __name__ == "__main__":
    main()
