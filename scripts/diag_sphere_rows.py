"""md() row counts for the sphere-trace skip vs exact, tiled like the real
renderer (stats=True trace-time counters; image returned for diff checks).

Usage (TPU): python scripts/diag_sphere_rows.py [bench|ref64]
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
from fluidsimulation_tpu.render.interior import deepen_phi


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


@functools.partial(jax.jit, static_argnames=("th", "tw", "spec"))
def frame_stats(tex, g9, co_c, right, up, fwd, th, tw, margin=None,
                scale=None, spec=None):
    W, H = 800, 600
    nty, ntx = -(-H // th), -(-W // tw)
    ys = jnp.repeat(jnp.arange(nty, dtype=jnp.float32) * th, ntx)
    xs = jnp.tile(jnp.arange(ntx, dtype=jnp.float32) * tw, nty)
    sphere = None if spec is None else (margin, scale, spec)

    def body(acc, yx):
        y0, x0 = yx[0], yx[1]
        px = (x0 + jnp.arange(tw, dtype=jnp.float32) + 0.5) / W
        py = (y0 + jnp.arange(th, dtype=jnp.float32) + 0.5) / H
        fx, fy = jnp.meshgrid(px, py, indexing="xy")
        ci = rt._norm((-1 + 2 * fx)[..., None] * right
                      + (1 - 2 * fy)[..., None] * up + fwd)
        co = jnp.broadcast_to(co_c, ci.shape)
        img, (mdr, g9r) = rt.shade(tex, co, ci, g9=g9, stats=True,
                                   sphere=sphere)
        return acc + mdr, img

    counts, tiles = jax.lax.scan(
        body, jnp.zeros(4, jnp.int32), jnp.stack([ys, xs], axis=1))
    img = tiles.reshape(nty, ntx, th, tw, 3).transpose(0, 2, 1, 3, 4)
    return counts, img.reshape(nty * th, ntx * tw, 3)[:H, :W]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ref64"
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
    texe = rt.PackedPhi(phi)
    texd = rt.PackedPhi(deepen_phi(phi))
    g9 = rt.PackedPhi9(phi) if rt.gradient_fits_phi9(phi.shape) else None

    c0, img0 = frame_stats(texe, g9, co, right, up, fwd, th, tw)
    fetch(img0)
    print("exact rows [total, out, fwd, bwd]:", np.asarray(c0), flush=True)
    base = np.asarray(img0)
    for margin, scale, spec in [(4.0, 1.0, 8), (4.0, 1.0, 4), (2.0, 1.0, 4),
                                (1.0, 1.0, 2), (2.0, 1.0, 8)]:
        c, img = frame_stats(texd, g9, co, right, up, fwd, th, tw,
                             margin=jnp.float32(margin),
                             scale=jnp.float32(scale), spec=spec)
        fetch(img)
        d = np.abs(np.asarray(img) - base)
        print(f"sphere m={margin} spec={spec}: rows", np.asarray(c),
              f"diff max={d.max():.5f} frac={(d.max(-1) > 1/255).mean():.5f}",
              flush=True)


if __name__ == "__main__":
    main()
