"""Sphere-trace skip A/B on the exact renderer (VERDICT r3 item 1).

The inside forward march fixed 1-cell 128-step loop (Render.fx:391-409) is
43.7M of the bench frame's 77.6M md() rows; phi is a signed distance, so a
lane can jump k = floor((d_cells - margin) * scale) lattice steps using the
sample it ALREADY consumed — zero extra gathers, unlike the L1 interior
skip whose 640 B rows cost more than the skipped steps (docs/PERF.md).

Times exact vs sphere-mode frames same-process on:
  (a) the bench scene   — step-31 dam break, 128^3/ppc1 (chaos, thin water)
  (b) the ref64 scene   — step-10 dam break, 64^3/ppc2 (thick column, the
                          reference's own demo config; 395-430 ms round 3)
and prints the pixel-diff bound of each sphere configuration vs exact.

Usage (TPU): python scripts/diag_sphere_trace.py [bench|ref64|both]
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


def timeit(name, f, n=3, rounds=2):
    img = f()
    fetch(img)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            img = f()
        fetch(img)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best * 1e3:8.1f} ms", flush=True)
    return best, img


def scene_phi(grid, ppc, n_steps, dt):
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    for _ in range(n_steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    return s.phi


def run_scene(tag, phi, band_rows):
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    def frame(**kw):
        return render_frame(phi, co, right, up, fwd, width=800, height=600,
                            band_rows=band_rows, **kw)

    _, base = timeit(f"{tag} exact", lambda: frame())
    base = np.asarray(base)
    for margin, scale, spec in [(1.0, 0.5, 8), (1.0, 0.5, 4),
                                (1.0, 0.9, 4), (0.5, 0.9, 2),
                                (1.0, 0.9, 8)]:
        _, img = timeit(
            f"{tag} sphere m={margin} s={scale} spec={spec}",
            lambda m=margin, sc=scale, sp=spec: frame(
                sphere_trace=True, sphere_margin=m, sphere_scale=sc,
                sphere_spec=sp))
        d = np.abs(np.asarray(img) - base)
        print(f"    diff: max={d.max():.5f} mean={d.mean():.7f} "
              f"frac_px>1/255={(d.max(-1) > 1 / 255).mean():.5f}",
              flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend", jax.default_backend(), flush=True)
    if which in ("bench", "both"):
        phi = scene_phi(128, 1, 31, 1.0 / 60.0)
        run_scene("bench128", phi, 100)
    if which in ("ref64", "both"):
        phi = scene_phi(64, 2, 10, 0.5 / 60.0)
        run_scene("ref64", phi, 64)


if __name__ == "__main__":
    main()
