"""A/B: per-step dispatch vs the lax.scan driver (solver.step3d.simulate).

Round-1 renderer work measured ~3 ms of per-dispatch overhead through the
axon tunnel (multi-dispatch tiling was overhead-bound); if step dispatches
do not fully overlap device execution, a 10-step simulate() program should
run measurably faster per step than 10 chained step_jit dispatches — and
scan may also fuse across the step boundary (blur of step k with advect of
k+1).  Same process, same state, interleaved rounds.

Usage: python scripts/diag_scan_driver.py [grid] [rounds]
"""

import sys
import time

import jax

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import simulate, step_jit


def fetch(s):
    jax.block_until_ready(s)
    jax.device_get(s.vel.ravel()[0])


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    dt = 1.0 / 60.0
    n = 10

    state = jax.device_put(init_state(cfg))
    # Warm up both programs.
    state = step_jit(state, dt, cfg)
    fetch(state)
    state = simulate(state, dt, cfg, n)
    fetch(state)

    best_a = best_b = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        s = state
        for _ in range(n):
            s = step_jit(s, dt, cfg)
        fetch(s)
        a = (time.perf_counter() - t0) / n * 1e3

        t0 = time.perf_counter()
        s2 = simulate(state, dt, cfg, n)
        fetch(s2)
        b = (time.perf_counter() - t0) / n * 1e3
        best_a, best_b = min(best_a, a), min(best_b, b)
        print(f"round {r}: dispatch-loop {a:7.1f} ms/step   "
              f"scan-driver {b:7.1f} ms/step", flush=True)
    print(f"best: dispatch-loop {best_a:.1f}  scan-driver {best_b:.1f}  "
          f"({best_a - best_b:+.1f} ms/step for scan)")


if __name__ == "__main__":
    main()
