"""Overstep (enhanced sphere tracing) A/B on the outside march: frame time,
md() row counts, and pixel diff vs the exact march, same-process.

The outside march is 77% of all md() rows on the bench scene after the
round-4 miss fix (30.0 of 39.0 M rows, diag_sphere_rows) — overstep jumps
omega*dt per probe with certified backtracking (raytrace.intersect_water).

Usage (TPU): python scripts/diag_overstep.py [bench|ref64]
"""

import functools
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


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def frame_stats(tex, g9, co_c, right, up, fwd, th, tw, overstep=None):
    W, H = 800, 600
    nty, ntx = -(-H // th), -(-W // tw)
    ys = jnp.repeat(jnp.arange(nty, dtype=jnp.float32) * th, ntx)
    xs = jnp.tile(jnp.arange(ntx, dtype=jnp.float32) * tw, nty)

    def body(acc, yx):
        y0, x0 = yx[0], yx[1]
        px = (x0 + jnp.arange(tw, dtype=jnp.float32) + 0.5) / W
        py = (y0 + jnp.arange(th, dtype=jnp.float32) + 0.5) / H
        fx, fy = jnp.meshgrid(px, py, indexing="xy")
        ci = rt._norm((-1 + 2 * fx)[..., None] * right
                      + (1 - 2 * fy)[..., None] * up + fwd)
        co = jnp.broadcast_to(co_c, ci.shape)
        img, (mdr, g9r) = rt.shade(tex, co, ci, g9=g9, stats=True,
                                   overstep=overstep)
        return acc + mdr, img

    counts, tiles = jax.lax.scan(
        body, jnp.zeros(4, jnp.int32), jnp.stack([ys, xs], axis=1))
    img = tiles.reshape(nty, ntx, th, tw, 3).transpose(0, 2, 1, 3, 4)
    return counts, img.reshape(nty * th, ntx * tw, 3)[:H, :W]


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
    tex = rt.PackedPhi(phi)
    g9 = rt.PackedPhi9(phi) if rt.gradient_fits_phi9(phi.shape) else None

    def timed_frame(ov, n=3, rounds=3):
        f = lambda: rt._render_scan(tex, co, right, up, fwd, 800, 600,
                                    th, tw, g9=g9, overstep=ov)
        img = f()
        fetch(img)
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                img = f()
            fetch(img)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    c0, img0 = frame_stats(tex, g9, co, right, up, fwd, th, tw)
    fetch(img0)
    t0 = timed_frame(None)
    print(f"exact: rows {np.asarray(c0)}  frame {1000*t0:.1f} ms", flush=True)
    base = np.asarray(img0)
    for om in (1.0, 1.2, 1.4, 1.6, 1.9):
        ov = jnp.float32(om)
        c, img = frame_stats(tex, g9, co, right, up, fwd, th, tw, overstep=ov)
        fetch(img)
        t = timed_frame(ov)
        d = np.abs(np.asarray(img) - base)
        print(f"omega={om}: rows {np.asarray(c)}  frame {1000*t:.1f} ms  "
              f"diff max={d.max():.5f} mean={d.mean():.2e} "
              f"frac>{1/255:.4f}={(d.max(-1) > 1/255).mean():.5f}",
              flush=True)


if __name__ == "__main__":
    main()
