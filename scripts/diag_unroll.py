"""In-process A/B of the march unroll factor (render, 800x600).

Usage: python scripts/diag_unroll.py [grid] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.solver.step3d import step_jit


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    jax.device_get(state.phi.ravel()[0])
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    imgs = {}
    for rnd in range(2):
        for unroll in (1, 2, 4, 8):
            rt._UNROLL = unroll
            rt._render_tile.clear_cache()
            rt._render_scan.clear_cache()
            img = rt.render(state.phi, co, right, up, fwd, 800, 600,
                            band_rows=64, band_cols=100)
            jax.block_until_ready(img)
            jax.device_get(img.ravel()[0])
            n = 3
            t0 = time.perf_counter()
            for _ in range(n):
                img = rt.render(state.phi, co, right, up, fwd, 800, 600,
                                band_rows=64, band_cols=100)
                jax.block_until_ready(img)
                jax.device_get(img.ravel()[0])
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"round {rnd} unroll {unroll}: {ms:8.1f} ms/frame", flush=True)
            if rnd == 0:
                imgs[unroll] = np.asarray(img)
    for u in (2, 4, 8):
        d = np.abs(imgs[u] - imgs[1]).max()
        print(f"max |unroll{u} - unroll1| = {d}", flush=True)


if __name__ == "__main__":
    main()
