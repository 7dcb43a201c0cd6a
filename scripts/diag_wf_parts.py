"""Decompose wavefront-renderer frame cost on the live backend.

Builds the REAL level-1/level-2 ray sets of an 800x600 frame from a
settled state, then times each part in isolation (own jit + fetch):
dense whole-batch intersect vs pool intersect (with round/refill stats),
gradient passes, and the dense glass/env legs.

Usage: python scripts/diag_wf_parts.py [grid] [steps] [pool] [spr]
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
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.experiments import wavefront as wf
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    for leaf in jax.tree_util.tree_leaves(x):
        jax.block_until_ready(leaf)
        jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, n=3):
    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    pool = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
    spr = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    print(f"backend {jax.default_backend()}, grid {grid}^3, "
          f"P={pool} C={spr}", flush=True)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    fetch(state.phi)
    tex = rt.PackedPhi(state.phi)
    md = lambda p: rt.map_dist_packed(tex, p)  # noqa: E731
    inv_m0 = 1.0 / jnp.float32(tex.dims[0])
    cam_pos, right, up, fwd = OrbitCamera().frame(800, 600)

    @jax.jit
    def rays_l1(tex):
        px = (jnp.arange(800, dtype=jnp.float32) + 0.5) / 800
        py = (jnp.arange(600, dtype=jnp.float32) + 0.5) / 600
        fx, fy = jnp.meshgrid(px, py, indexing="xy")
        ci = rt._norm((-1 + 2 * fx)[..., None] * right
                      + (1 - 2 * fy)[..., None] * up + fwd).reshape(-1, 3)
        co = jnp.broadcast_to(jnp.asarray(cam_pos), ci.shape)
        _, prim_co, prim_ci, _, _ = rt.trace_glass(co, ci)
        co1 = prim_co + 0.001 * prim_ci
        half = jnp.array([0.5, 0.5, 0.5], jnp.float32)
        _, max_t, _, _ = rt.intersect_aabb(co1, prim_ci, -half, half)
        return co1 - 0.001 * prim_ci, prim_ci, max_t

    co1, ci1, mt1 = rays_l1(tex)
    fetch(mt1)
    n1 = int(mt1.shape[0])
    alive1 = int(jnp.sum(mt1 < rt.LARGE))
    print(f"level-1 rays: {n1}, marchable {alive1}", flush=True)

    @jax.jit
    def dense_l1(tex, co, ci, mt):
        mdl = lambda p: rt.map_dist_packed(tex, p)  # noqa: E731
        return rt.intersect_water(mdl, inv_m0, co + 0.001 * ci, ci, mt)

    @functools.partial(jax.jit, static_argnames=("p_", "c_"))
    def pool_l1(tex, co, ci, mt, p_, c_):
        mdl = lambda p: rt.map_dist_packed(tex, p)  # noqa: E731
        return wf.intersect_water_wf(mdl, inv_m0, co + 0.001 * ci, ci, mt,
                                     pool=p_, spr=c_, with_stats=True)

    ms, ref1 = timeit(dense_l1, tex, co1, ci1, mt1)
    print(f"L1 dense whole-batch intersect: {ms:8.1f} ms", flush=True)
    ms, out1 = timeit(pool_l1, tex, co1, ci1, mt1, pool, spr)
    p1, t1, st1 = out1
    print(f"L1 pool intersect             : {ms:8.1f} ms  stats "
          f"{jax.tree_util.tree_map(int, st1)}", flush=True)
    d = jnp.abs(ref1[1] - t1)
    print(f"   t diff: max {float(d.max()):.2e} "
          f"frac>1e-5 {float((d > 1e-5).mean()):.4f}", flush=True)

    # Level-2 ray set (children of level 1, with dead mask).
    @jax.jit
    def rays_l2(tex, co, ci, mt):
        mdl = lambda p: rt.map_dist_packed(tex, p)  # noqa: E731
        ip1, d_a, w_a, d_b, w_b = rt._expand_bounce(mdl, inv_m0, co, ci)
        co2 = jnp.concatenate([ip1, ip1], axis=0)
        d2 = jnp.concatenate([d_a, d_b], axis=0)
        w2 = jnp.concatenate([w_a, w_b], axis=0)
        half = jnp.array([0.5, 0.5, 0.5], jnp.float32)
        co2e = co2 + 0.001 * d2
        _, mt2, _, _ = rt.intersect_aabb(co2e, d2, -half, half)
        return co2, d2, w2, mt2

    co2, d2, w2, mt2 = rays_l2(tex, co1, ci1, mt1)
    fetch(mt2)
    alive2 = int(jnp.sum((mt2 < rt.LARGE) & (w2 > 0)))
    print(f"level-2 rays: {int(mt2.shape[0])}, marchable {alive2}",
          flush=True)

    @jax.jit
    def dense_l2(tex, co, ci, mt, w):
        mdl = lambda p: rt.map_dist_packed(tex, p)  # noqa: E731
        return rt.intersect_water(mdl, inv_m0, co + 0.001 * ci, ci, mt,
                                  dead=w <= 0.0)

    @functools.partial(jax.jit, static_argnames=("p_", "c_"))
    def pool_l2(tex, co, ci, mt, w, p_, c_):
        mdl = lambda p: rt.map_dist_packed(tex, p)  # noqa: E731
        return wf.intersect_water_wf(mdl, inv_m0, co + 0.001 * ci, ci, mt,
                                     dead=w <= 0.0, pool=p_, spr=c_,
                                     with_stats=True)

    ms, _ = timeit(dense_l2, tex, co2, d2, mt2, w2)
    print(f"L2 dense whole-batch intersect: {ms:8.1f} ms", flush=True)
    ms, out2 = timeit(pool_l2, tex, co2, d2, mt2, w2, pool, spr)
    print(f"L2 pool intersect             : {ms:8.1f} ms  stats "
          f"{jax.tree_util.tree_map(int, out2[2])}", flush=True)

    # Dense legs.
    @jax.jit
    def grad_leg(tex, p):
        mdl = lambda p_: rt.map_dist_packed(tex, p_)  # noqa: E731
        return rt.compute_gradient(mdl, p)

    ms, _ = timeit(grad_leg, tex, p1)
    print(f"gradient 4-tap on L1 hits     : {ms:8.1f} ms", flush=True)

    @jax.jit
    def glass_leg(co, ci):
        return rt.trace_water0(co, ci)

    co4 = jnp.concatenate([co2, co2], axis=0)
    d4 = jnp.concatenate([d2, d2], axis=0)
    ms, _ = timeit(glass_leg, co4, d4)
    print(f"trace_water0 (4N glass+env)   : {ms:8.1f} ms", flush=True)

    np.asarray(p1)  # keep linters quiet


if __name__ == "__main__":
    main()
