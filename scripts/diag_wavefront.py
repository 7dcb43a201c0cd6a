"""Same-process A/B: tiled exact renderer vs wavefront pool renderer.

Usage: python scripts/diag_wavefront.py [grid] [steps] [pools] [sprs]
Only intra-process ratios are load-bearing (tunnel perf-state drift).
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
from fluidsimulation_tpu.render.raytrace import PackedPhi, render
from fluidsimulation_tpu.experiments.wavefront import render_wavefront
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    pools = [int(p) for p in sys.argv[3].split(",")] if len(sys.argv) > 3 \
        else [65536, 131072, 262144]
    sprs = [int(s) for s in sys.argv[4].split(",")] if len(sys.argv) > 4 \
        else [4, 6, 8]
    cfg = SimConfig(
        nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
        particles_per_cell_axis=1 if grid >= 128 else 2,
    )
    print(f"backend {jax.default_backend()}, grid {grid}^3", flush=True)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    fetch(state.phi)
    tex = PackedPhi(state.phi)
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    def timeit(fn, n=3):
        img = fn()
        fetch(img)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                img = fn()
                fetch(img)
            best = min(best, (time.perf_counter() - t0) / n)
        return best, img

    t_ref, img_ref = timeit(
        lambda: render(tex, co, right, up, fwd, 800, 600, band_rows=64)
    )
    print(f"tiled 64x100      : {t_ref*1e3:8.1f} ms/frame "
          f"(mean px {float(jnp.mean(img_ref)):.4f})", flush=True)

    for pool in pools:
        for spr in sprs:
            for skip in (False, True):
                try:
                    t_wf, img = timeit(
                        lambda: render_wavefront(
                            state.phi, co, right, up, fwd, 800, 600,
                            pool=pool, spr=spr, skip=skip)
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"wavefront P={pool:6d} C={spr} skip={int(skip)}:"
                          f" FAILED {e}", flush=True)
                    continue
                d = float(jnp.abs(img - img_ref).mean())
                print(f"wavefront P={pool:6d} C={spr} skip={int(skip)}: "
                      f"{t_wf*1e3:8.1f} ms/frame (mean|diff| {d:.2e}, "
                      f"mean px {float(jnp.mean(img)):.4f})", flush=True)
    assert np.isfinite(np.asarray(img)).all()


if __name__ == "__main__":
    main()
