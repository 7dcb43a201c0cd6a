"""bf16/f16 packed-texture A/B: frame time + image diff vs the f32 rows.

VERDICT r3 item 1(b): PackedPhi rows are 512 B and PackedPhi9 rows 1152 B;
the width cost model (CLAUDE.md) says ~1 KB rows pay a 30-60% bandwidth tax
over 512 B, so halving storage may buy real frame time.  This measures the
four combinations (md texture x gradient texture dtype) on a scene,
same-process, with the max/frac pixel diff vs the exact f32 frame.

Usage (TPU): python scripts/diag_texture_dtype.py [bench|ref64]
"""

import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render import raytrace as rt


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if which == "bench":
        grid, ppc, steps, dt, th, tw = 128, 1, 31, 1 / 60, 100, 100
    else:
        grid, ppc, steps, dt, th, tw = 64, 2, 10, 0.5 / 60, 64, 100
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    for _ in range(steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    phi = s.phi
    print("backend", jax.default_backend(), which, flush=True)

    co, right, up, fwd = OrbitCamera().frame(800, 600)

    def frame(tex, g9):
        img = rt._render_scan(tex, co, right, up, fwd, 800, 600, th, tw,
                              g9=g9)
        fetch(img)
        return img

    def time_frames(tex, g9, n=3, rounds=3):
        frame(tex, g9)  # compile
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                img = frame(tex, g9)
            best = min(best, (time.perf_counter() - t0) / n)
        return best, np.asarray(img)

    variants = [
        ("f32/f32", None, None),
        ("bf16/f32", jnp.bfloat16, None),
        ("bf16/bf16", jnp.bfloat16, jnp.bfloat16),
        ("f16/f16", jnp.float16, jnp.float16),
    ]
    base = None
    for name, md_dt, g9_dt in variants:
        tex = rt.PackedPhi(phi, dtype=md_dt)
        g9 = (rt.PackedPhi9(phi, dtype=g9_dt)
              if rt.gradient_fits_phi9(phi.shape) else None)
        t, img = time_frames(tex, g9)
        if base is None:
            base = img
            print(f"{name}: {1000*t:.1f} ms (baseline)", flush=True)
        else:
            d = np.abs(img - base)
            print(f"{name}: {1000*t:.1f} ms  diff max={d.max():.5f} "
                  f"mean={d.mean():.2e} frac>{1/255:.4f}="
                  f"{(d.max(-1) > 1/255).mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
