"""Renderer tile-size re-sweep with the round-3 default path (Phi9 gradient
+ current march).  The 64x100 pin dates from the round-2 sweep, BEFORE the
Phi9 single-gather gradient changed the per-surface-point cost balance —
re-sweep at the settled state, same process, scalar-fetch timing.

Usage (TPU): python scripts/diag_render_tiles3.py [grid] [steps]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.solver.step3d import step_jit

W, H = 800, 600


def timeit(fn, reps=3):
    img = fn()
    jax.device_get(img.ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        img = fn()
        jax.device_get(img.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, np.asarray(img)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cfg = SimConfig(nx=n, ny=n, nz=n, particles_per_cell_axis=1)
    state = init_state(cfg)
    dt = jnp.float32(1.0 / 60.0)
    for _ in range(steps):
        state = step_jit(state, dt, cfg)
    jax.device_get(state.pos[0, 0])
    phi = state.phi
    print("backend", jax.default_backend(), "grid", n, "settled", steps,
          flush=True)

    co, right, up, fwd = OrbitCamera().frame(W, H)
    tex = rt.PackedPhi(phi)
    g9 = rt.PackedPhi9(phi)
    scan_raw = rt._render_scan.__wrapped__

    tiles = [(64, 100), (32, 100), (64, 50), (32, 50), (64, 200),
             (128, 100), (100, 100), (16, 100), (64, 25)]
    ref_img = None
    results = {}
    for th, tw in tiles:
        f = jax.jit(functools.partial(scan_raw, width=W, height=H,
                                      tile_h=th, tile_w=tw))
        t, img = timeit(lambda: f(tex, co, right, up, fwd, g9=g9))
        if ref_img is None:
            ref_img = img
        eq = np.array_equal(ref_img, img)
        results[(th, tw)] = t
        print(f"tile {th:3d}x{tw:3d}: {t:8.1f} ms   eq={eq}", flush=True)
    best = min(results, key=results.get)
    print(f"best: {best} at {results[best]:.1f} ms "
          f"(default 64x100 at {results[(64, 100)]:.1f})")


if __name__ == "__main__":
    main()
