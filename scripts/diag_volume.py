"""Why does the dam break lose volume when settled?  Discriminate:
(a) under-converged SOR at 128^3 (reference's 100 iters were tuned <=64^3),
(b) cell-table overflow truncation feedback,
(c) reference-config behavior (64^3, ppc=2).

Tracks y_mean (settled half-dam should approach ~0.25, not ~0.03) and
post-projection divergence.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit


def run(tag, cfg, steps, dt):
    s = jax.device_put(init_state(cfg))
    t0 = time.perf_counter()
    for i in range(steps):
        s = step_jit(s, jnp.float32(dt), cfg)
        if i % 20 == 19:
            ym = float(s.pos[:, 1].mean())
            div = float(
                jnp.abs(
                    (s.u[1:] - s.u[:-1]) + (s.v[:, 1:] - s.v[:, :-1])
                    + (s.w[:, :, 1:] - s.w[:, :, :-1])
                ).max()
            )
            print(f"  {tag} step {i+1}: y_mean={ym:.4f} max|div|={div:.3e}",
                  flush=True)
    print(f"  ({time.perf_counter()-t0:.0f}s)", flush=True)


base128 = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
print("A: 128^3 ppc1, sor=100 (bench config)", flush=True)
run("A", base128, 80, 1 / 60)
print("B: 128^3 ppc1, sor=300", flush=True)
run("B", dataclasses.replace(base128, sor_iterations=300), 80, 1 / 60)
print("C: 64^3 ppc2, sor=100 (reference demo config)", flush=True)
run("C", SimConfig(nx=64, ny=64, nz=64, cells_per_meter=64.0), 80, 1 / 60)
