"""Check for LARGE-sentinel leaks in rendered frames: render a settled state
and report pixel-magnitude stats, A/B with the dead-ray (TIR skip) path
disabled.

Usage: python scripts/diag_render_large.py [grid] [steps]
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


def stats(name, img):
    img = np.asarray(img)
    print(f"{name}: mean {img.mean():.4g} max {img.max():.4g} "
          f"px>10 {(img > 10).any(-1).sum()} finite {np.isfinite(img).all()}",
          flush=True)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    jax.device_get(state.phi.ravel()[0])
    print("phi finite:", bool(jnp.isfinite(state.phi).all()),
          "vel max:", float(jnp.abs(state.vel).max()), flush=True)

    co, right, up, fwd = OrbitCamera().frame(800, 600)
    img = rt.render(state.phi, co, right, up, fwd, 800, 600,
                    band_rows=64, band_cols=100)
    stats("with dead-ray skip", img)

    # A/B: disable the dead-ray path.
    orig = rt._expand_bounce

    def no_dead(md, inv_m0, co, ci, w=None):
        return orig(md, inv_m0, co, ci, None)

    rt._expand_bounce = no_dead
    rt._render_scan.clear_cache()
    rt._render_tile.clear_cache()
    img2 = rt.render(state.phi, co, right, up, fwd, 800, 600,
                     band_rows=64, band_cols=100)
    rt._expand_bounce = orig
    stats("without (pre-change)", img2)
    d = np.abs(np.asarray(img) - np.asarray(img2))
    print("max |A-B|:", d.max(), "npix diff>1e-4:", (d > 1e-4).any(-1).sum(),
          flush=True)


if __name__ == "__main__":
    main()
