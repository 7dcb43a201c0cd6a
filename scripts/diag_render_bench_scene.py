"""Renderer A/B on the BENCH scene (step-21 dam break at 128^3).

Round-3 tile sweeps used a *settled* 128^3 state (127 ms at 100x100);
bench.py renders the phi after 21 steps of the collapsing dam and reports
~358 ms.  The gap is scene-bound: mid-collapse surface is chaotic, so the
whole-tile early exits fire late.  This script times the exact bench frame
same-process across tile shapes and eager-vs-fused texture build, so the
default is tuned for the scene the bench (and any real interactive run)
actually draws.

Usage (TPU): python scripts/diag_render_bench_scene.py [n_steps]
"""

import sys
import time

import jax

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render, render_frame


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
    print(f"{name:40s} {best * 1e3:8.1f} ms", flush=True)
    return best


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    grid = 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    dt = 1.0 / 60.0
    s = jax.device_put(init_state(cfg))
    for _ in range(n_steps):
        s = step_jit(s, dt, cfg)
    jax.block_until_ready(s)
    jax.device_get(s.vel.ravel()[0])
    phi = s.phi
    print("backend", jax.default_backend(), "steps", n_steps, flush=True)

    co, right, up, fwd = OrbitCamera().frame(800, 600)

    # Fused (render_frame) across tile shapes.
    import os
    shapes = [(100, 100), (64, 100), (50, 100), (100, 50), (50, 50),
              (32, 100), (64, 64), (25, 100)]
    if os.environ.get("BIG"):
        # Chaos favors big batches (little early exit): push upward.
        shapes = [(100, 100), (100, 200), (200, 100), (200, 200),
                  (150, 100), (300, 100), (600, 800), (100, 400)]
    for th, tw in shapes:
        timeit(f"fused {th}x{tw}",
               lambda th=th, tw=tw: render_frame(
                   phi, co, right, up, fwd, width=800, height=600,
                   band_rows=th, band_cols=tw))

    if os.environ.get("BIG"):
        # Bounce-level attribution at the best tile.
        for b in (2, 1, 0):
            timeit(f"bounces={b} 100x100",
                   lambda b=b: render_frame(
                       phi, co, right, up, fwd, width=800, height=600,
                       band_rows=100, bounces=b))
    else:
        # Eager texture build (round-2 style) at the current default tile.
        timeit("eager 100x100",
               lambda: render(phi, co, right, up, fwd, 800, 600,
                              band_rows=100))


if __name__ == "__main__":
    main()
