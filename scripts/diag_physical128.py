"""Physical-config (128^3/ppc2/8M, dt=1/120) fused-step diagnostic
(VERDICT r3 item 2).

FINDING (round 4): in a clean single-process run the fused step is
867 ms with HBM temp 10.47 GB (args 0.47 + out 0.51) — comfortably
inside the 16 GB chip.  The 8.0 s fused / 3.0 s stage-sum numbers that
motivated this script were TPU-contention artifacts (a 200-step soak
was still running on the tunneled chip; CLAUDE.md's "never two TPU
processes" rule).  Round 3's 1.1-2.4 s/step record carried the same
contamination.

Prints the compiled step's memory analysis, then the fused-step time.

Usage (TPU): python scripts/diag_physical128.py [--no-pallas]
"""

import os
import sys
import time

sys.path.insert(0, ".")

if "--no-pallas" in sys.argv:
    os.environ["FST_NO_PALLAS"] = "1"

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.vel.ravel()[0])


def time_steps(state, dt, cfg, n=3, rounds=2):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        s = state
        for _ in range(n):
            s = step_jit(s, dt, cfg)
        fetch(s)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    grid, ppc = 128, 2
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    dt = jnp.float32(1 / 120)
    print(f"backend {jax.default_backend()}  N={cfg.num_particles}",
          flush=True)
    state = jax.device_put(init_state(cfg))

    lowered = jax.jit(
        lambda s, d: step_jit(s, d, cfg)
    ).lower(state, dt)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        gb = 1 / 2**30
        print(f"HBM: args {ma.argument_size_in_bytes * gb:.2f} GB  "
              f"out {ma.output_size_in_bytes * gb:.2f} GB  "
              f"temp {ma.temp_size_in_bytes * gb:.2f} GB  "
              f"peak(gen) {getattr(ma, 'generated_code_size_in_bytes', 0) * gb:.3f}",
              flush=True)

    state = step_jit(state, dt, cfg)
    fetch(state)
    t = time_steps(state, dt, cfg)
    print(f"fused step: {t * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
