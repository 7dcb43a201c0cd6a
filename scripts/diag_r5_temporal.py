"""Round-5 temporal-coherence A/B: the demo's interleaved step+render loop
with and without t-seeding (VERDICT r4 item 3).

Per frame: one sim step, then one 800x600 render.  The warm variant seeds
both water marches from the previous frame's per-pixel t (the camera is
static, as in bench/liveview between interactions); the cold variant is the
reference behavior (Render.fx:369 re-pays the full march every frame).
Reports per-frame times for both, plus the warm-vs-cold pixel diff of the
SAME frame (the fidelity bound of record).

Usage (TPU, solo): python scripts/diag_r5_temporal.py [bench128|ref64]
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
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "bench128"
    if scene == "bench128":
        grid, ppc, dt, warm_steps = 128, 1, 1.0 / 60.0, 32
    else:
        grid, ppc, dt, warm_steps = 64, 2, 0.5 / 60.0, 10
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    for _ in range(warm_steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    print("backend", jax.default_backend(), "scene", scene, flush=True)
    co, right, up, fwd = OrbitCamera().frame(800, 600)
    br = 100 if grid >= 128 else 64

    def draw(phi, t_seed):
        img, t = render_frame(phi, co, right, up, fwd, width=800,
                              height=600, band_rows=br,
                              t_seed=t_seed, return_t=True)
        jax.block_until_ready(img)
        jax.device_get(img.ravel()[0])
        return img, t

    def draw_cold(phi):
        img = render_frame(phi, co, right, up, fwd, width=800, height=600,
                           band_rows=br)
        jax.block_until_ready(img)
        jax.device_get(img.ravel()[0])
        return img

    # Compile all three programs (cold, seeded-None+return_t, seeded).
    img_c = draw_cold(s.phi)
    img0, t = draw(s.phi, None)
    draw(s.phi, t)
    fetch(s.vel)

    n_frames = 8
    # Interleaved warm loop.
    sw, tw = s, t
    warm_ms, diffs = [], []
    for i in range(n_frames):
        t0 = time.perf_counter()
        sw = step_jit(sw, dt, cfg)
        img_w, tw = draw(sw.phi, tw)
        warm_ms.append(1000 * (time.perf_counter() - t0))
        # Fidelity: same frame rendered cold (not timed).
        d = np.abs(np.asarray(img_w) - np.asarray(draw_cold(sw.phi)))
        diffs.append(((d.max(-1) > 1 / 255).mean(), d.max()))
    # Interleaved cold loop (same start state sequence).
    sc = s
    cold_ms = []
    for i in range(n_frames):
        t0 = time.perf_counter()
        sc = step_jit(sc, dt, cfg)
        draw_cold(sc.phi)
        cold_ms.append(1000 * (time.perf_counter() - t0))

    wm = np.array(warm_ms)
    cm = np.array(cold_ms)
    print(f"warm step+frame ms: {np.round(wm, 1).tolist()}")
    print(f"cold step+frame ms: {np.round(cm, 1).tolist()}")
    print(f"median warm {np.median(wm):.1f} vs cold {np.median(cm):.1f} "
          f"-> {np.median(cm) / np.median(wm):.2f}x")
    fr = max(f for f, _ in diffs)
    mx = max(m for _, m in diffs)
    print(f"pixel diff bound over {n_frames} frames: "
          f"max frac>1/255 = {fr:.4f}, max abs = {mx:.3f}")


if __name__ == "__main__":
    main()
