"""Diagnose the garbage pixels in the 256^3 rendered frame.

smoke_render256 produced a finite frame with mean ~1e9: some pixels carry
huge finite values.  Locate them, print their magnitudes and positions, and
compare against a 128^3 frame from the same camera to see whether the
quirk is grid-size dependent.

Usage: python scripts/diag_render256.py [grid] [n_steps]
"""
import sys
sys.path.insert(0, ".")
import jax
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit, clamp_dt
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(np.asarray(x).ravel()[0])


def main(grid=256, n_steps=3):
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    dt = clamp_dt(cfg, 1 / 240, simulation_rate=1.0)
    s = jax.device_put(init_state(cfg))
    for _ in range(n_steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    co, right, up, fwd = OrbitCamera().frame(800, 600)
    img = render_frame(s.phi, co, right, up, fwd, width=800, height=600,
                       band_rows=100)
    fetch(img)
    a = np.asarray(img)
    np.save(f"/tmp/frame{grid}.npy", a)
    mx = a.max(axis=-1)
    bad = mx > 10.0
    print(f"grid {grid}: mean {a.mean():.4g}  max {a.max():.4g}  "
          f"bad(>10) pixels {bad.sum()} of {bad.size}")
    if bad.any():
        ys, xs = np.nonzero(bad)
        print("  y range", ys.min(), ys.max(), " x range", xs.min(), xs.max())
        vals = a[bad]
        print("  bad value quantiles:", np.quantile(vals.max(axis=-1),
                                                    [0, 0.5, 1.0]))
        # sample a few coordinates
        for k in range(0, min(len(ys), 2000), max(1, len(ys) // 8)):
            print(f"    ({ys[k]:3d},{xs[k]:3d}) -> {a[ys[k], xs[k]]}")
    good = a[~bad]
    print(f"  good-pixel mean {good.mean():.4f}")


if __name__ == "__main__":
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(g, n)
