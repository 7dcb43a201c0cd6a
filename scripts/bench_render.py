"""Render throughput on the live backend: 800x600 from a settled dam-break
phi at the given grid, for several band sizes.

Usage: python scripts/bench_render.py [grid] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.device_get(x.ravel()[0])


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = SimConfig(
        nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
        particles_per_cell_axis=1 if grid >= 128 else 2,
    )
    print(f"backend {jax.default_backend()}, grid {grid}^3")
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    fetch(state.phi)

    co, right, up, fwd = OrbitCamera().frame(800, 600)
    import numpy as np

    for band, cols in ((64, 100), (32, 100), (64, 200), (32, 200),
                       (64, 400), (48, 100), (96, 100), (64, 800),
                       (120, 100), (32, 400)):
        img = render(state.phi, co, right, up, fwd, 800, 600,
                     band_rows=band, band_cols=cols)
        jax.block_until_ready(img)
        fetch(img)
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            img = render(state.phi, co, right, up, fwd, 800, 600,
                         band_rows=band, band_cols=cols)
            jax.block_until_ready(img)
            fetch(img)
        dt = (time.perf_counter() - t0) / n
        print(f"tile {band:4d}x{cols or 800:4d}: {dt*1e3:8.1f} ms/frame  "
              f"(mean px {float(jnp.mean(img)):.3f})", flush=True)
    assert np.isfinite(np.asarray(img)).all()


if __name__ == "__main__":
    main()
