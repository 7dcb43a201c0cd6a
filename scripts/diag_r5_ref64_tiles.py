"""Interleaved TILE sweep at the canonical ref64 scene, post-miss-fix.

bench_ref64.py's 100-row full-width bands date from a ROUND-3 sweep
(pre escaped-bounce-child miss fix); the round-4 215.3 ms ref64 record
(diag_sphere_rows/diag_sphere_trace) used 64x100 tiles.  Tile-shape
optima are scene- and row-mix-dependent, so re-sweep interleaved (the
within-process drift is ~1.6x tonight — sequential blocks lie).

Usage (TPU, solo): python scripts/diag_r5_ref64_tiles.py [rounds]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit, clamp_dt
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    cfg = SimConfig()
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    s = jax.device_put(init_state(cfg))
    for _ in range(10):
        s = step_jit(s, dt, cfg)
    jax.block_until_ready(s.pos)
    jax.device_get(np.asarray(s.vel).ravel()[0])
    phi = s.phi
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    shapes = [(100, 0), (64, 100), (100, 100), (50, 100), (64, 200),
              (32, 100)]

    def mk(br, bc):
        def draw():
            img = render_frame(phi, co, right, up, fwd, width=800,
                               height=600, band_rows=br, band_cols=bc)
            jax.block_until_ready(img)
            jax.device_get(np.asarray(img).ravel()[0])
            return img
        return draw

    fns = {f"{br}x{bc or 800}": mk(br, bc) for br, bc in shapes}
    for name, f in fns.items():
        t0 = time.perf_counter()
        f()
        print(f"compile+first {name}: {time.perf_counter()-t0:.1f} s",
              flush=True)

    times = {k: [] for k in fns}
    for r in range(rounds):
        for name, f in fns.items():
            t0 = time.perf_counter()
            f()
            times[name].append(time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]*1e3:.0f}" for k in fns), flush=True)

    print("\nmedians (ms):", flush=True)
    for name in fns:
        print(f"  {name:10s} {np.median(times[name])*1e3:7.1f}", flush=True)


if __name__ == "__main__":
    main()
