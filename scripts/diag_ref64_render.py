"""Tile-shape A/B for the 64^3 head-to-head render scene.

bench_ref64.py was first run with band_rows=64 (the settled-scene optimum
for 64^3 grids) and measured 528 ms — far above the 128^3 chaos scene's
318 ms.  The round-3 tile re-sweep showed chaos scenes punish small tiles;
this script A/Bs tile shapes on the exact bench_ref64 scene (step-10 64^3
/ 953k dam break) in one process so the numbers are comparable.

Usage: python scripts/diag_ref64_render.py [n_steps]
"""
import sys, time
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


def main(n_steps=10):
    cfg = SimConfig()
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    s = jax.device_put(init_state(cfg))
    for _ in range(n_steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    ref = None
    for rows, cols in [(100, 100), (64, 100), (100, 0), (64, 0), (150, 100),
                       (100, 200)]:
        def draw():
            img = render_frame(s.phi, co, right, up, fwd, width=800,
                               height=600, band_rows=rows, band_cols=cols)
            fetch(img)
            return img
        img = draw()  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                img = draw()
            best = min(best, (time.perf_counter() - t0) / 3)
        a = np.asarray(img)
        if ref is None:
            ref = a
        print(f"rows={rows:4d} cols={cols:4d}: {1000*best:7.1f} ms  "
              f"bitmatch={bool((a == ref).all())}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
