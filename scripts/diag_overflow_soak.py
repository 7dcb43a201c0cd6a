"""200-step 64^3/ppc2 soak with the overflow autotune loop (VERDICT r3
item 3 'Done' criterion): every step's n_overflow must be covered by the
active cap (no silent drops), including through the slosh peak.

Also times each cap tier's step cost (the fidelity price).

Usage (TPU): python scripts/diag_overflow_soak.py [steps]
"""

import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import (
    overflow_autotune,
    overflow_count,
    step_jit,
)


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cfg = SimConfig(nx=64, ny=64, nz=64, cells_per_meter=64.0,
                    particles_per_cell_axis=2)
    print("backend", jax.default_backend(), "N", cfg.num_particles,
          flush=True)
    s = jax.device_put(init_state(cfg))
    drops = 0
    worst = (0, 0, 0)  # (uncovered, step, n_over)
    tier_times = {}
    t_prev = time.perf_counter()
    for i in range(steps):
        s = step_jit(s, 0.5 / 60.0, cfg)
        # Monitor EVERY step here (the demo checks every 4; this soak
        # verifies the per-step contract the 4-step cadence must keep).
        n_over = int(overflow_count(s.pos, cfg))
        fetch(s.vel)
        dt_ms = 1000 * (time.perf_counter() - t_prev)
        t_prev = time.perf_counter()
        tier_times.setdefault(cfg.overflow_cap, []).append(dt_ms)
        uncovered = max(0, n_over - cfg.overflow_cap)
        if uncovered:
            drops += 1
            if uncovered > worst[0]:
                worst = (uncovered, i + 1, n_over)
        if i % 4 == 3:  # the demo's cadence
            new = overflow_autotune(cfg, n_over)
            if new is not cfg:
                print(f"step {i + 1}: n_overflow={n_over} -> cap "
                      f"{new.overflow_cap}", flush=True)
                cfg = new
        if (i + 1) % 25 == 0:
            print(f"step {i + 1}: n_over={n_over} cap={cfg.overflow_cap} "
                  f"step={dt_ms:.0f} ms", flush=True)
    print("\nper-tier step ms (median of steady samples):")
    for cap, ts in sorted(tier_times.items()):
        ts = sorted(ts)[1:-1] or ts  # drop compile outliers
        print(f"  cap {cap:7d}: {np.median(ts):7.1f} ms  ({len(ts)} steps)")
    print(f"\nsteps with uncovered overflow: {drops} / {steps}")
    if drops:
        print(f"  worst: {worst[0]} uncovered at step {worst[1]} "
              f"(n_over {worst[2]})")
    else:
        print("  NO SILENT DROPS: n_overflow <= cap at every step")


if __name__ == "__main__":
    main()
