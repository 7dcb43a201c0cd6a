"""Interleaved render-mode A/B at the canonical ref64 scene (docs/PERF.md
scene inventory: 64^3/ppc2, dt=1/60 x rate 0.5, 10 steps from reset).

The tunnel drifts WITHIN a process too; sequential best-of blocks (like
bench_ref64.py's) can order modes wrongly.  This interleaves one frame of
every mode per round so drift hits all modes equally, and reports
per-round ratios plus medians.

Usage (TPU, solo): python scripts/diag_r5_ref64_modes.py [rounds]
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

    def mk(**kw):
        def draw():
            out = render_frame(phi, co, right, up, fwd, width=800,
                               height=600, band_rows=100, **kw)
            img = out[0] if isinstance(out, tuple) else out
            jax.block_until_ready(img)
            jax.device_get(np.asarray(img).ravel()[0])
            return out
        return draw

    modes = {
        "plain_march": mk(sphere_trace=False),
        "sphere(default)": mk(),
        "sphere+ov1.4": mk(overstep=1.4),
        "sphere+ov1.6": mk(overstep=1.6),
    }
    # Temporal self-seed: needs a persistent t; do it inline below.
    t_seed = {"t": None}

    def draw_temporal():
        img, t = render_frame(phi, co, right, up, fwd, width=800,
                              height=600, band_rows=100, overstep=1.4,
                              t_seed=t_seed["t"], return_t=True)
        jax.block_until_ready(img)
        jax.device_get(np.asarray(img).ravel()[0])
        t_seed["t"] = t
        return img

    modes["temporal_selfseed"] = draw_temporal

    for name, f in modes.items():  # compile + absorb first-exec stall
        t0 = time.perf_counter()
        f()
        print(f"compile+first {name}: {time.perf_counter()-t0:.1f} s",
              flush=True)

    times = {k: [] for k in modes}
    for r in range(rounds):
        for name, f in modes.items():
            t0 = time.perf_counter()
            f()
            times[name].append(time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]*1e3:.0f}" for k in modes), flush=True)

    base = np.median(times["plain_march"])
    print("\nmedians (ms) and ratio vs plain_march:", flush=True)
    for name in modes:
        m = np.median(times[name])
        print(f"  {name:18s} {m*1e3:7.1f}  {m/base:.3f}", flush=True)


if __name__ == "__main__":
    main()
