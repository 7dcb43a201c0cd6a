"""A/B: tiled exact renderer with vs without the interior skip
(render/interior.py PackedPhiSkip wired into intersect_water's inside
forward march) on the BENCH scene (step-21 dam break at 128^3 — the
chaos scene bench.py draws) and optionally the settled scene.

Asserts bit-equality (the skip is provably exact on power-of-two
grids) and prints frame times + md-row splits (out/fwd/bwd).

Usage (TPU): python scripts/diag_skip_tiled.py [n_steps]
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
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.render import interior as intr


def fetch(x):
    for leaf in jax.tree.leaves(x):
        jax.block_until_ready(leaf)
        jax.device_get(leaf.ravel()[0])
        return


@functools.partial(jax.jit, static_argnames=("skip", "stats"))
def frame(phi, co, right, up, fwd, skip, stats=False, margin=None):
    tex = rt.PackedPhi(phi)
    g9 = rt.PackedPhi9(phi)
    texs = intr.PackedPhiSkip(phi) if skip else None
    th, tw, W, H = 100, 100, 800, 600
    nty, ntx = H // th, W // tw
    ys = jnp.repeat(jnp.arange(nty, dtype=jnp.float32) * th, ntx)
    xs = jnp.tile(jnp.arange(ntx, dtype=jnp.float32) * tw, nty)

    def body(carry, yx):
        px = (yx[1] + jnp.arange(tw, dtype=jnp.float32) + 0.5) / W
        py = (yx[0] + jnp.arange(th, dtype=jnp.float32) + 0.5) / H
        fx, fy = jnp.meshgrid(px, py, indexing="xy")
        u = -1.0 + 2.0 * fx
        v = 1.0 - 2.0 * fy
        ci = rt._norm(u[..., None] * right + v[..., None] * up + fwd)
        cob = jnp.broadcast_to(co, ci.shape)
        res = rt.shade(tex, cob, ci, g9=g9, stats=stats, texs=texs,
                       skip_margin=margin)
        if stats:
            img_t, (md_rows, g9r) = res
            return (carry[0] + md_rows, carry[1] + g9r), img_t
        return carry, res

    init = (jnp.zeros(4, jnp.int32), jnp.int32(0))
    counts, tiles = jax.lax.scan(body, init, jnp.stack([ys, xs], axis=1))
    img = tiles.reshape(nty, ntx, th, tw, 3).transpose(0, 2, 1, 3, 4)
    return img.reshape(H, W, 3), counts


def timeit(name, f, n=3, rounds=2):
    out = f()
    fetch(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best * 1e3:8.1f} ms", flush=True)
    return out


def run_scene(tag, phi, co, right, up, fwd):
    print(f"--- scene: {tag}", flush=True)
    img_a, _ = timeit("no skip (current)",
                      lambda: frame(phi, co, right, up, fwd, False))
    img_b, _ = timeit("interior skip",
                      lambda: frame(phi, co, right, up, fwd, True))
    # Same compiled program, margin traced to +inf: the structural cost of
    # the skip path (640 B rows, d8 select, per-lane counters) with ZERO
    # skipping — separates row/op overhead from skip behavior.
    timeit("skip program, margin=+inf (structural)",
           lambda: frame(phi, co, right, up, fwd, True,
                         margin=jnp.float32(1e9)))
    eq = np.array_equal(np.asarray(img_a), np.asarray(img_b))
    print("bit-equal:", eq, flush=True)
    if not eq:
        d = np.abs(np.asarray(img_a) - np.asarray(img_b))
        print("  max abs diff", d.max(), "at", np.unravel_index(d.argmax(), d.shape))
    for skip in (False, True):
        (_, counts) = frame(phi, co, right, up, fwd, skip, stats=True)
        fetch(counts)
        md = np.asarray(counts[0])
        g9r = int(np.asarray(counts[1]))
        print(f"  skip={skip}: md rows {md[0]:,} (out {md[1]:,} "
              f"fwd {md[2]:,} bwd {md[3]:,}) g9 {g9r:,}", flush=True)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    grid = 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    for _ in range(n_steps):
        s = step_jit(s, 1.0 / 60.0, cfg)
    fetch(s.vel)
    print("backend", jax.default_backend(), "steps", n_steps, flush=True)
    co, right, up, fwd = OrbitCamera().frame(800, 600)
    run_scene(f"step-{n_steps} dam break (bench scene)", s.phi,
              co, right, up, fwd)


if __name__ == "__main__":
    main()
