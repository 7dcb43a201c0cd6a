"""Benchmark at the reference's EXACT demo config: 64^3 grid,
cells_per_meter=64, ppc_axis=2 -> 953,312 particles (Simulation.cpp:47-74),
dt = 1/60 * simulation_rate 0.5 clamped (Simulation.cpp:515), plus the
800x600 exact 2-bounce frame — the honest head-to-head against the
reference's "30 fps on at least one laptop" (README.md:15).

Usage: python scripts/bench_ref64.py [n_steps]
"""
import sys, time
sys.path.insert(0, ".")
import jax
import numpy as np

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit, clamp_dt
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(np.asarray(x).ravel()[0] if not hasattr(x, "vel") else x.vel.ravel()[0])


def main(n_steps=10):
    cfg = SimConfig()  # 64^3, cpm=64, ppc_axis=2 (the reference demo)
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    print(f"config: {cfg.nx}^3, {cfg.num_particles} particles, dt={dt:.5f}")
    s = jax.device_put(init_state(cfg))
    s = step_jit(s, dt, cfg)
    fetch(s)

    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            s = step_jit(s, dt, cfg)
        fetch(s)
        best = max(best, n_steps / (time.perf_counter() - t0))
    print(f"step: {1000/best:.1f} ms = {best:.2f} steps/s (best of 2x{n_steps})")

    # Render the CANONICAL ref64 scene (docs/PERF.md scene inventory:
    # 10 steps from reset — the pre-collapse thick water column all
    # round-4 ref64 render records used).  The step timing above leaves
    # the state at step ~21 (mid-collapse, ~1.9x the render rows);
    # re-deriving the step-10 state keeps every number in this script
    # keyed to the ONE scene ID.
    s = jax.device_put(init_state(cfg))
    for _ in range(10):
        s = step_jit(s, dt, cfg)
    fetch(s)

    co, right, up, fwd = OrbitCamera().frame(800, 600)

    def draw(phi):
        # Tile shape re-swept interleaved round 5 post-miss-fix
        # (scripts/diag_r5_ref64_tiles.py): 100-row bands, 64x100,
        # 100x100, 50x100, 32x100 all within tunnel noise on this scene
        # — keep the round-3 100-row bands.
        img = render_frame(phi, co, right, up, fwd, width=800, height=600,
                           band_rows=100)
        jax.block_until_ready(img)
        jax.device_get(np.asarray(img).ravel()[0])
        return img

    img = draw(s.phi)
    rbest = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            img = draw(s.phi)
        rbest = min(rbest, (time.perf_counter() - t0) / 3)
    assert np.isfinite(np.asarray(img)).all()
    fps = 1.0 / (1.0 / best + rbest)
    print(f"render: {1000*rbest:.1f} ms/frame (800x600, exact 2-bounce)")
    print(f"sim+render: {fps:.2f} fps (reference: 30 fps on a laptop GPU)")

    # NOTE on fast modes at ref64 (round-5 interleaved A/B,
    # scripts/diag_r5_ref64_modes.py): the shipped sphere-trace default
    # is the win here (-10.6% vs the plain march, bit-identical);
    # overstep omega=1.4/1.6 measured a WASH-TO-NEGATIVE on this
    # inside-march-dominated scene (1.02-1.12x) and is left off.  The
    # one certified non-exact win is temporal coherence (-21%
    # self-seeded), measured below as the interactive loop.
    t_prev = None
    frame_times = []
    for i in range(8):
        t0 = time.perf_counter()
        s = step_jit(s, dt, cfg)
        img, t_prev = render_frame(
            s.phi, co, right, up, fwd, width=800, height=600,
            band_rows=100, t_seed=t_prev, return_t=True)
        jax.block_until_ready(img)
        jax.device_get(np.asarray(img).ravel()[0])
        frame_times.append(time.perf_counter() - t0)
    assert np.isfinite(np.asarray(img)).all()
    med = float(np.median(frame_times[1:]))
    print(f"interactive loop (temporal): "
          f"{1000*med:.1f} ms/frame = {1.0/med:.2f} fps "
          f"(median of steps 2-8)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
