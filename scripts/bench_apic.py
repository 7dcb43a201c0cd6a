"""APIC stepper timing (default: the reference demo config, 64^3/953k).

Measured round 4 (TPU v5e, same-process A/Bs in docs/PERF.md): 64^3/953k
157.5 ms/step (was 224), 128^3/ppc1/1.0M 253.7 (was 265) after
advect_rk3_pic.  Cross-process numbers from THIS script drift with the
tunnel's machine states (214-263 observed at 64^3 for the same binary)
— use scripts/diag_apic_cache_ab.py for comparisons.  The remaining
~1.7x vs PIC/FLIP is structural (36-vs-18-cell spline windows, 2x-wide
table).

Usage: python scripts/bench_apic.py [n_steps] [grid] [ppc]
"""
import sys, time
sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.solver.apic import init_apic_state, step_apic_jit
from fluidsimulation_tpu.solver.step3d import clamp_dt


def _time_loop(s, dt, cfg, n_steps):
    s = step_apic_jit(s, dt, cfg)
    jax.block_until_ready(s.pos)
    jax.device_get(np.asarray(s.vel).ravel()[0])
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            s = step_apic_jit(s, dt, cfg)
        jax.block_until_ready(s.pos)
        jax.device_get(np.asarray(s.vel).ravel()[0])
        best = max(best, n_steps / (time.perf_counter() - t0))
    return best, s


def main(n_steps=5, grid=64, ppc=2):
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    best, s = _time_loop(jax.device_put(init_apic_state(cfg)), dt, cfg,
                         n_steps)
    assert np.isfinite(np.asarray(s.vel)).all()
    assert np.isfinite(np.asarray(s.C)).all()
    print(f"apic step ({grid}^3 / {cfg.num_particles}p): "
          f"{1000/best:.1f} ms = {best:.2f} steps/s (best of 2x{n_steps})")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4] if not a.startswith("--")]
    main(*args)
