"""APIC stepper timing at 64^3 / 953k (the reference demo config).

The APIC pair (ops/apic.py) is the correctness-tier scatter/gather
formulation (27 spline nodes x 3 components each way); this records its
real cost next to the PIC/FLIP fast path so the docs stay honest about
the tier difference.

Usage: python scripts/bench_apic.py [n_steps]
"""
import sys, time
sys.path.insert(0, ".")
import jax
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.solver.apic import init_apic_state, step_apic_jit
from fluidsimulation_tpu.solver.step3d import clamp_dt


def main(n_steps=5):
    cfg = SimConfig()  # 64^3, ppc2 -> 953,312 particles
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    s = jax.device_put(init_apic_state(cfg))
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
    assert np.isfinite(np.asarray(s.vel)).all()
    assert np.isfinite(np.asarray(s.C)).all()
    print(f"apic step (64^3 / {cfg.num_particles}p): "
          f"{1000/best:.1f} ms = {best:.2f} steps/s (best of 2x{n_steps})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
