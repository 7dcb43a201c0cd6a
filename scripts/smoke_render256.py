"""256^3 renderer capability smoke: exercise the exact tiled renderer past
the 128^3 target config (the step side is already recorded — docs/PARITY.md
"256^3 capability smoke").

Steps a 256^3 / 8.19M-particle dam break a few guarded steps, then renders
one exact 800x600 2-bounce frame from the 256^3 phi and reports timing +
frame health.  256^3 phi = 67 MB; the PackedPhi9 texture rows scale with
nx*ny rows x 9x32 lanes, all static shapes — only wall-clock and HBM grow.

Usage: python scripts/smoke_render256.py [n_steps]
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


def main(n_steps=3):
    g = 256
    cfg = SimConfig(nx=g, ny=g, nz=g, cells_per_meter=float(g),
                    particles_per_cell_axis=1)
    dt = clamp_dt(cfg, 1 / 240, simulation_rate=1.0)
    print(f"config: {g}^3, {cfg.num_particles} particles, dt={dt:.5f}")
    s = jax.device_put(init_state(cfg))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    print(f"{n_steps} steps in {time.perf_counter()-t0:.1f} s (incl. compile)")

    co, right, up, fwd = OrbitCamera().frame(800, 600)

    def draw():
        img = render_frame(s.phi, co, right, up, fwd, width=800, height=600,
                           band_rows=100)
        fetch(img)
        return img

    t0 = time.perf_counter()
    img = draw()  # compile
    print(f"render compile+first frame: {time.perf_counter()-t0:.1f} s")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        img = draw()
        best = min(best, time.perf_counter() - t0)
    a = np.asarray(img)
    assert np.isfinite(a).all(), "non-finite pixels"
    # Health on the DISPLAY image (clamped like the reference's swapchain):
    # raw frames are HDR (sun disc ~1840) and carry the documented all-TIR
    # sentinel quirk on a couple of camera-dependent pixels
    # (render/raytrace.py "largeNum sentinels"; measured 2 pixels at this
    # camera) — the raw mean is meaningless.
    d = np.clip(a, 0.0, 1.0)
    quirk = int((a.max(axis=-1) > 1e6).sum())
    uniq = len(np.unique((d * 255).astype(np.uint8).reshape(-1, 3), axis=0))
    print(f"render: {1000*best:.1f} ms/frame  display_mean={d.mean():.3f} "
          f"unique_colors={uniq}  sentinel_quirk_pixels={quirk}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
