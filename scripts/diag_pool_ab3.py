"""Pinpoint the shipped pool's 2.5x overhead vs its replica.

  E1 shipped intersect_water_wf, one jit               (expect slow)
  E2 queue build in its own jit, pool+writeback in another
  E3 one jit, but optimization_barrier between queue build and the loop
  E4 one jit, barrier only on rec_q

Usage: python scripts/diag_pool_ab3.py [grid] [steps] [pool] [spr]
"""

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


def build_queue(co, ci, mt):
    p0 = co + 0.5
    needs = mt < rt.LARGE
    oidx_f = jnp.arange(co.shape[0], dtype=jnp.float32)
    rec = jnp.stack([p0[:, 0], p0[:, 1], p0[:, 2], ci[:, 0], ci[:, 1],
                     ci[:, 2], mt, oidx_f], axis=-1)
    qidx = jnp.nonzero(needs, size=co.shape[0], fill_value=0)[0]
    return rec[qidx], needs.sum()


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
    spr = int(sys.argv[4]) if len(sys.argv) > 4 else 6
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
    n = P
    co = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32))
    ci = rng.normal(size=(n, 3)).astype(np.float32)
    ci /= np.linalg.norm(ci, axis=1, keepdims=True)
    ci = jnp.asarray(ci)
    half = jnp.array([0.5, 0.5, 0.5], jnp.float32)
    _, mt, _, _ = rt.intersect_aabb(co, ci, -half, half)
    r_trace = 8 * (-(-n // P)) + 4

    @jax.jit
    def e1(tex, co, ci, mt):
        md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
        return wf.intersect_water_wf(md, inv, co, ci, mt, pool=P, spr=spr)

    jq = jax.jit(build_queue)

    @jax.jit
    def e2_pool(tex, rec_q, m_count):
        md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
        return wf._march_pool(md, rec_q, m_count, n, inv, P, spr, r_trace)

    def e2(tex, co, ci, mt):
        rec_q, m = jq(co, ci, mt)
        return e2_pool(tex, rec_q, m)

    @jax.jit
    def e3(tex, co, ci, mt):
        md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
        rec_q, m = build_queue(co, ci, mt)
        rec_q, m = lax.optimization_barrier((rec_q, m))
        return wf._march_pool(md, rec_q, m, n, inv, P, spr, r_trace)

    @jax.jit
    def e4(tex, co, ci, mt):
        md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
        rec_q, m = build_queue(co, ci, mt)
        rec_q = lax.optimization_barrier(rec_q)
        return wf._march_pool(md, rec_q, m, n, inv, P, spr, r_trace)

    ms, _ = timeit(e1, tex, co, ci, mt)
    print(f"E1 shipped one-jit      : {ms:8.1f} ms", flush=True)
    ms, _ = timeit(e2, tex, co, ci, mt)
    print(f"E2 split jits           : {ms:8.1f} ms", flush=True)
    ms, _ = timeit(jq, co, ci, mt)
    print(f"   queue build alone    : {ms:8.1f} ms", flush=True)
    ms, _ = timeit(e3, tex, co, ci, mt)
    print(f"E3 one-jit + barrier    : {ms:8.1f} ms", flush=True)
    ms, _ = timeit(e4, tex, co, ci, mt)
    print(f"E4 one-jit + rec barrier: {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
