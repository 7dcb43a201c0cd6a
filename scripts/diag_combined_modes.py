"""Combined fast-mode frame on the ref64 head-to-head scene: sphere-trace
inside skip + overstep outside march, vs exact — same-process A/B.

Usage (TPU): python scripts/diag_combined_modes.py [bench|ref64]
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
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ref64"
    if which == "bench":
        grid, ppc, steps, dt, br = 128, 1, 31, 1 / 60, 100
    else:
        grid, ppc, steps, dt, br = 64, 2, 10, 0.5 / 60, 64
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    for _ in range(steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    print("backend", jax.default_backend(), which, flush=True)
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    def timed(name, **kw):
        f = lambda: render_frame(s.phi, co, right, up, fwd, width=800,
                                 height=600, band_rows=br, **kw)
        img = f()
        fetch(img)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                img = f()
            fetch(img)
            best = min(best, (time.perf_counter() - t0) / 3)
        print(f"{name:36s} {1000 * best:7.1f} ms", flush=True)
        return np.asarray(img)

    base = timed("exact")
    variants = [
        ("overstep=1.4", dict(overstep=1.4)),
        ("sphere m=1 s=0.9", dict(sphere_trace=True, sphere_margin=1.0,
                                  sphere_scale=0.9)),
        ("sphere m=1 s=0.9 + overstep=1.4",
         dict(sphere_trace=True, sphere_margin=1.0, sphere_scale=0.9,
              overstep=1.4)),
        ("sphere m=1 s=0.9 + overstep=1.6",
         dict(sphere_trace=True, sphere_margin=1.0, sphere_scale=0.9,
              overstep=1.6)),
    ]
    for name, kw in variants:
        img = timed(name, **kw)
        d = np.abs(img - base)
        print(f"    diff max={d.max():.5f} frac>{1/255:.4f}="
              f"{(d.max(-1) > 1/255).mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
