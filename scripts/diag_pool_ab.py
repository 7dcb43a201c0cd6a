"""Isolate the wavefront pool's per-round overhead, same-process A/B.

Variants (all P=131k, same ray set, 16 rounds x 6 steps equivalent):
  A bare-fori    : lane steps only, fori_loop, no refill/trace/cond
  B bare-while   : same but lax.while_loop with the real cond
  C while+trace  : B + (r_trace+1, P, 4) trace carried + final evac row
  D full pool    : _march_pool as shipped (cond-gated refill)

Usage: python scripts/diag_pool_ab.py [grid] [steps] [pool] [spr]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.experiments import wavefront as wf
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
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
    spr = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    rounds = 16
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    print(f"backend {jax.default_backend()}, grid {grid}^3, P={P} C={spr}",
          flush=True)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    fetch(state.phi)
    tex = rt.PackedPhi(state.phi)
    inv = 1.0 / jnp.float32(tex.dims[0])

    rng = np.random.default_rng(0)
    co = jnp.asarray(rng.uniform(-0.4, 0.4, (P, 3)).astype(np.float32))
    ci = rng.normal(size=(P, 3)).astype(np.float32)
    ci /= np.linalg.norm(ci, axis=1, keepdims=True)
    ci = jnp.asarray(ci)
    half = jnp.array([0.5, 0.5, 0.5], jnp.float32)
    _, mt, _, _ = rt.intersect_aabb(co, ci, -half, half)
    p0 = co + 0.5

    def init_st():
        zf, zi = jnp.zeros(P), jnp.zeros(P, jnp.int32)
        return (jnp.full((P,), wf.CLASSIFY, jnp.int32), p0, zf, zf, zi, zi,
                mt, p0, ci, jnp.arange(P, dtype=jnp.int32))

    def stepper(tex, st):
        md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
        for _ in range(spr):
            st = wf._lane_step(md(st[1]), st, inv)
        return st

    @jax.jit
    def var_a(tex):
        return lax.fori_loop(0, rounds, lambda i, s: stepper(tex, s),
                             init_st())[2]

    @jax.jit
    def var_b(tex):
        def cond(c):
            r, st = c
            return (r < rounds) & jnp.any(st[0] != wf.FIN)

        def body(c):
            r, st = c
            return r + 1, stepper(tex, st)

        return lax.while_loop(cond, body, (jnp.int32(0), init_st()))[1][2]

    r_trace = 12
    FINv = wf.FIN

    @jax.jit
    def var_c(tex):
        trace0 = jnp.zeros((r_trace + 1, P, 4), jnp.float32)

        def cond(c):
            r, trace, st = c
            return (r < rounds) & jnp.any(st[0] != wf.FIN)

        def body(c):
            r, trace, st = c
            st = stepper(tex, st)
            return r + 1, trace, st

        r, trace, st = lax.while_loop(cond, body,
                                      (jnp.int32(0), trace0, init_st()))
        key = jnp.where(st[0] == FINv, st[9] + 1, 0).astype(jnp.float32)
        row = jnp.stack([key, st[2], st[3], jnp.zeros(P)], axis=-1)
        trace = lax.dynamic_update_index_in_dim(trace, row, 0, 0)
        return trace


    @functools.partial(jax.jit, static_argnames=())
    def var_d(tex, co, ci, mt):
        md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
        return wf.intersect_water_wf(md, inv, co, ci, mt, pool=P, spr=spr,
                                     with_stats=True)

    ms, _ = timeit(var_a, tex)
    print(f"A bare fori    : {ms:8.1f} ms "
          f"({ms*1e6/(rounds*spr*P):6.2f} ns/lane-step)", flush=True)
    ms, _ = timeit(var_b, tex)
    print(f"B bare while   : {ms:8.1f} ms", flush=True)
    ms, _ = timeit(var_c, tex)
    print(f"C while+trace  : {ms:8.1f} ms", flush=True)
    ms, out = timeit(var_d, tex, co, ci, mt)
    print(f"D full pool    : {ms:8.1f} ms  stats "
          f"{jax.tree_util.tree_map(int, out[2])}", flush=True)


if __name__ == "__main__":
    main()
