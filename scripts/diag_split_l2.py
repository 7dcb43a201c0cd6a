"""A/B: level-2 bounce children traced CONCATENATED (2N batch, one
intersect_water) vs SPLIT (two N-batches).  Split pays N*iters_refl +
N*iters_trans instead of 2N*max(...) — wins when the children's march
profiles differ (reflection children skim the surface; transmission
children run the 128-step inside march).  Per-lane math is identical, so
images are bit-equal.

Also dumps stats-mode md-row counts per level (the transaction-floor
analysis input for docs/PERF.md).

Usage (TPU): python scripts/diag_split_l2.py [n_steps]
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


def fetch(x):
    for leaf in jax.tree.leaves(x):
        jax.block_until_ready(leaf)
        jax.device_get(leaf.ravel()[0])


def trace_water2_variant(md, inv_m0, co, ci, g9, split, stats=False):
    shape = co.shape
    r1 = rt._expand_bounce(md, inv_m0, co, ci, g9=g9, stats=stats)
    ip1, d_a, w_a, d_b, w_b = r1[:5]
    if split:
        r2a = rt._expand_bounce(md, inv_m0, ip1, d_a, w=w_a, g9=g9, stats=stats)
        r2b = rt._expand_bounce(md, inv_m0, ip1, d_b, w=w_b, g9=g9, stats=stats)
        ip2 = jnp.concatenate([r2a[0], r2b[0]], axis=0)
        d_c = jnp.concatenate([r2a[1], r2b[1]], axis=0)
        w_c = jnp.concatenate([r2a[2], r2b[2]], axis=0)
        d_d = jnp.concatenate([r2a[3], r2b[3]], axis=0)
        w_d = jnp.concatenate([r2a[4], r2b[4]], axis=0)
        st2 = None
        if stats:
            st2 = (r2a[5][0] + r2b[5][0], r2a[5][1] + r2b[5][1])
    else:
        co2 = jnp.concatenate([ip1, ip1], axis=0)
        d2 = jnp.concatenate([d_a, d_b], axis=0)
        w2_ = jnp.concatenate([w_a, w_b], axis=0)
        r2 = rt._expand_bounce(md, inv_m0, co2, d2, w=w2_, g9=g9, stats=stats)
        ip2, d_c, w_c, d_d, w_d = r2[:5]
        st2 = r2[5] if stats else None
    w2 = jnp.concatenate([w_a, w_b], axis=0)
    co3 = jnp.concatenate([ip2, ip2], axis=0)
    d3 = jnp.concatenate([d_c, d_d], axis=0)
    w3 = jnp.concatenate([w2 * w_c, w2 * w_d], axis=0)
    cols = rt.trace_water0(co3, d3)
    cols = cols.reshape(4, *shape)
    w3 = w3.reshape(4, *shape[:-1])
    out = (cols * w3[..., None]).sum(axis=0)
    if stats:
        return out, r1[5], st2
    return out


@functools.partial(jax.jit, static_argnames=("split", "stats"))
def frame(tex, g9, co_c, right, up, fwd, split, stats=False):
    """All 48 100x100 tiles via lax.scan, shade inlined with the variant."""
    md = lambda p: rt.map_dist_packed(tex, p)
    inv_m0 = 1.0 / jnp.float32(tex.dims[0])
    th, tw, W, H = 100, 100, 800, 600
    nty, ntx = H // th, W // tw
    ys = jnp.repeat(jnp.arange(nty, dtype=jnp.float32) * th, ntx)
    xs = jnp.tile(jnp.arange(ntx, dtype=jnp.float32) * tw, nty)

    def body(carry, yx):
        y0, x0 = yx[0], yx[1]
        px = (x0 + jnp.arange(tw, dtype=jnp.float32) + 0.5) / W
        py = (y0 + jnp.arange(th, dtype=jnp.float32) + 0.5) / H
        fx, fy = jnp.meshgrid(px, py, indexing="xy")
        u = -1.0 + 2.0 * fx
        v = 1.0 - 2.0 * fy
        ci = rt._norm(u[..., None] * right + v[..., None] * up + fwd)
        co = jnp.broadcast_to(co_c, ci.shape)
        h, prim_co, prim_ci, _, _ = rt.trace_glass(co, ci)
        hit = h < rt.LARGE
        res = trace_water2_variant(md, inv_m0, prim_co, prim_ci, g9, split,
                                   stats=stats)
        if stats:
            col_water, st1, st2 = res
            carry = (carry[0] + st1[0], carry[1] + st2[0],
                     carry[2] + st1[1] + st2[1])
        else:
            col_water = res
        col_sky = rt.sample_environment(ci)
        col = jnp.where(hit[..., None], col_water, col_sky)
        out = jnp.abs(col) ** 2.2
        return carry, jnp.nan_to_num(out, nan=0.0, posinf=1.0, neginf=0.0)

    init = (jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32), jnp.int32(0))
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
    print(f"{name:40s} {best * 1e3:8.1f} ms", flush=True)
    return out


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

    tex = jax.jit(rt.PackedPhi)(s.phi)
    g9 = jax.jit(rt.PackedPhi9)(s.phi)
    fetch(tex.rows); fetch(g9.rows)
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    img_c, _ = timeit("concat (current)", lambda: frame(tex, g9, co, right, up, fwd, False))
    img_s, _ = timeit("split", lambda: frame(tex, g9, co, right, up, fwd, True))
    print("bit-equal:", np.array_equal(np.asarray(img_c), np.asarray(img_s)),
          flush=True)

    for split, tag in ((True, ""), (False, " (concat)")):
        (img, counts) = frame(tex, g9, co, right, up, fwd, split, stats=True)
        fetch(counts)
        l1, l2 = (np.asarray(c) for c in counts[:2])
        g9r = int(np.asarray(counts[2]))
        print(f"md rows/frame{tag}: level1 {l1[0]:,} (out {l1[1]:,} "
              f"fwd {l1[2]:,} bwd {l1[3]:,}) level2 {l2[0]:,} "
              f"(out {l2[1]:,} fwd {l2[2]:,} bwd {l2[3]:,}) g9 {g9r:,}",
              flush=True)


if __name__ == "__main__":
    main()
