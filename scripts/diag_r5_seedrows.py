"""Why didn't temporal seeding move the frame time?  Row-stats A/B on a
STATIC scene with a perfect self-seed (the best case the mechanism can
ever see): if md() rows don't drop, the seeding is inert (bug); if rows
drop but time doesn't, the frame is bound by per-scan-iteration overhead,
not march gathers.

Usage (TPU): python scripts/diag_r5_seedrows.py [bench128|ref64]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


@functools.partial(jax.jit, static_argnames=("th", "tw", "use_seed"))
def frame_stats(tex, g9, co_c, right, up, fwd, th, tw, t_seed, sb,
                use_seed):
    W, H = 800, 600
    nty, ntx = -(-H // th), -(-W // tw)
    ys = jnp.repeat(jnp.arange(nty, dtype=jnp.float32) * th, ntx)
    xs = jnp.tile(jnp.arange(ntx, dtype=jnp.float32) * tw, nty)
    seed = None
    if use_seed:
        seed = jnp.pad(
            t_seed, ((0, 0), (0, nty * th - H), (0, ntx * tw - W)),
            constant_values=rt.LARGE)

    def body(acc, yx):
        y0, x0 = yx[0], yx[1]
        px = (x0 + jnp.arange(tw, dtype=jnp.float32) + 0.5) / W
        py = (y0 + jnp.arange(th, dtype=jnp.float32) + 0.5) / H
        fx, fy = jnp.meshgrid(px, py, indexing="xy")
        ci = rt._norm((-1 + 2 * fx)[..., None] * right
                      + (1 - 2 * fy)[..., None] * up + fwd)
        co = jnp.broadcast_to(co_c, ci.shape)
        st = None
        if use_seed:
            st = jax.lax.dynamic_slice(
                seed, (jnp.int32(0), y0.astype(jnp.int32),
                       x0.astype(jnp.int32)), (3, th, tw))
        img, (mdr, g9r), t = rt.shade(tex, co, ci, g9=g9, stats=True,
                                      t_seed=st, seed_back=sb,
                                      return_t=True)
        return acc + mdr, (img, t)

    counts, (tiles, ts) = jax.lax.scan(
        body, jnp.zeros(4, jnp.int32), jnp.stack([ys, xs], axis=1))
    img = tiles.reshape(nty, ntx, th, tw, 3).transpose(0, 2, 1, 3, 4)
    t = ts.reshape(nty, ntx, 3, th, tw).transpose(2, 0, 3, 1, 4)
    return (counts,
            img.reshape(nty * th, ntx * tw, 3)[:H, :W],
            t.reshape(3, nty * th, ntx * tw)[:, :H, :W])


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "bench128"
    if scene == "bench128":
        grid, ppc, dt, steps, th, tw = 128, 1, 1.0 / 60.0, 32, 100, 100
    else:
        grid, ppc, dt, steps, th, tw = 64, 2, 0.5 / 60.0, 10, 64, 100
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    for _ in range(steps):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    print("backend", jax.default_backend(), "scene", scene, flush=True)

    from fluidsimulation_tpu.render.interior import deepen_phi

    tex = rt.PackedPhi(deepen_phi(s.phi))
    g9 = (rt.PackedPhi9(s.phi)
          if rt.gradient_fits_phi9(s.phi.shape) else None)
    co, right, up, fwd = OrbitCamera().frame(800, 600)
    sb = jnp.float32(6.0 / grid)
    dummy = jnp.zeros((3, 600, 800), jnp.float32)

    def run(name, use_seed, seed):
        counts, img, t = frame_stats(tex, g9, co, right, up, fwd, th, tw,
                                     seed, sb, use_seed)
        fetch(img)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            counts, img, t = frame_stats(tex, g9, co, right, up, fwd,
                                         th, tw, seed, sb, use_seed)
            fetch(img)
            best = min(best, time.perf_counter() - t0)
        c = np.asarray(counts)
        print(f"{name}: rows [tot {c[0]/1e6:.1f}M out {c[1]/1e6:.1f}M "
              f"fwd {c[2]/1e6:.1f}M bwd {c[3]/1e6:.1f}M]  {best*1e3:.1f} ms",
              flush=True)
        return np.asarray(img), np.asarray(t)

    img_c, t_c = run("cold", False, dummy)
    img_w, t_w = run("self-seeded", True, jnp.asarray(t_c))
    d = np.abs(img_w - img_c)
    print(f"static self-seed diff: frac>1/255 {(d.max(-1) > 1/255).mean():.4f} "
          f"max {d.max():.3f}", flush=True)


if __name__ == "__main__":
    main()
