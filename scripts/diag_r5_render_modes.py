"""Round-5 render-mode A/B at the scenes of record (docs/PERF.md scene
inventory): pick bench/demo defaults with same-process numbers.

Scenes:
  bench128 — the phi bench.py actually draws (128^3/ppc1, dt=1/60,
             32 steps: 1 compile + 1 warmup + 3x10 timed rounds).
  ref64    — the 64^3 head-to-head scene (ppc2, dt=1/120 via rate 0.5,
             10 steps, scripts/bench_ref64.py).

Variants: exact march, sphere_trace (certified default margin),
sphere_trace+overstep {1.4, 1.6}, and a tile re-sweep under the winning
mode.

Usage (TPU, solo process): python scripts/diag_r5_render_modes.py [scene]
"""

import sys
import time

import jax

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame
from fluidsimulation_tpu.solver.step3d import step_jit


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
    return best


def make_scene(which):
    if which == "bench128":
        grid, ppc, dt, steps = 128, 1, 1.0 / 60.0, 32
    elif which == "ref64":
        grid, ppc, dt, steps = 64, 2, 0.5 / 60.0, 10
    else:
        raise SystemExit(f"unknown scene {which}")
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    for _ in range(steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    return s.phi, grid


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "bench128"
    phi, grid = make_scene(scene)
    print("backend", jax.default_backend(), "scene", scene, flush=True)
    co, right, up, fwd = OrbitCamera().frame(800, 600)
    br = 100 if grid >= 128 else 64

    def frame(**kw):
        kw.setdefault("band_rows", br)
        return render_frame(phi, co, right, up, fwd,
                            width=800, height=600, **kw)

    timeit("exact (sphere off)", lambda: frame(sphere_trace=False))
    timeit("sphere m=4 (default)", lambda: frame())
    timeit("sphere m=1 s=0.9", lambda: frame(sphere_margin=1.0,
                                             sphere_scale=0.9))
    timeit("sphere + overstep 1.4", lambda: frame(overstep=1.4))
    timeit("sphere + overstep 1.6", lambda: frame(overstep=1.6))
    # Tile sweep under the shipping default (sphere_trace on).
    for th, tw in ((100, 100), (100, 200), (150, 100), (64, 100),
                   (100, 50), (200, 100)):
        if (th, tw) == (br, 100):
            continue
        timeit(f"sphere tiles {th}x{tw}",
               lambda th=th, tw=tw: frame(band_rows=th, band_cols=tw))


if __name__ == "__main__":
    main()
