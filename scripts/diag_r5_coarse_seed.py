"""Same-frame coarse seeding A/B (round 5): a 1/k-res pre-pass seeds the
full-res marches with FRESH per-pixel ts — unlike temporal seeding there
is no staleness, so it can pay on moving scenes where temporal measured
0.99-1.01x.  Interleaved protocol (one frame of each mode per round —
the render-path tunnel drift demands it, CLAUDE.md).

Usage (TPU, solo): python scripts/diag_r5_coarse_seed.py [bench|ref64] [rounds]
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
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "bench"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    if which == "bench":
        grid, ppc, steps, dt = 128, 1, 31, 1 / 60
    else:
        grid, ppc, steps, dt = 64, 2, 10, 0.5 / 60
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    for _ in range(steps):
        s = step_jit(s, dt, cfg)
    jax.block_until_ready(s.pos)
    jax.device_get(np.asarray(s.vel).ravel()[0])
    phi = s.phi
    co, right, up, fwd = OrbitCamera().frame(800, 600)
    print("scene", which, "grid", grid, flush=True)

    def mk(**kw):
        def draw():
            img = render_frame(phi, co, right, up, fwd, width=800,
                               height=600, band_rows=100, **kw)
            jax.block_until_ready(img)
            jax.device_get(np.asarray(img).ravel()[0])
            return img
        return draw

    fns = {
        "exact": mk(),
        "coarse2": mk(coarse_seed=2),
        "coarse4": mk(coarse_seed=4),
        "coarse8": mk(coarse_seed=8),
    }
    imgs = {}
    for name, f in fns.items():
        t0 = time.perf_counter()
        imgs[name] = np.asarray(f())
        print(f"compile+first {name}: {time.perf_counter()-t0:.1f} s",
              flush=True)
    base = imgs["exact"]
    for name in fns:
        d = np.abs(imgs[name] - base)
        print(f"  {name}: px diff max {d.max():.4f} "
              f"frac>1/255 {(d.max(-1) > 1/255).mean():.4f}", flush=True)

    times = {k: [] for k in fns}
    for r in range(rounds):
        for name, f in fns.items():
            t0 = time.perf_counter()
            f()
            times[name].append(time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]*1e3:.0f}" for k in fns), flush=True)

    base_t = np.median(times["exact"])
    print("\nmedians (ms) / ratio vs exact:", flush=True)
    for name in fns:
        m = np.median(times[name])
        print(f"  {name:8s} {m*1e3:7.1f}  {m/base_t:.3f}", flush=True)


if __name__ == "__main__":
    main()
