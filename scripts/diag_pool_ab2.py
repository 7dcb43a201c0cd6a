"""Bisect _march_pool's overhead (same-process A/B).

  C  while+trace baseline (no refill, no writeback)
  D1 ungated refill every round, writeback = trace.sum() (no compaction)
  D2 cond-gated refill, writeback = trace.sum()
  D3 ungated refill + full writeback (nonzero+gather+scatter)
  D  shipped _march_pool

Usage: python scripts/diag_pool_ab2.py [grid] [steps] [pool] [spr]
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
    p0 = co + 0.5
    oidx_f = jnp.arange(n, dtype=jnp.float32)
    rec_q = jnp.stack([p0[:, 0], p0[:, 1], p0[:, 2],
                       ci[:, 0], ci[:, 1], ci[:, 2], mt, oidx_f], axis=-1)
    r_trace = 12

    def make_pool(gated, full_wb):
        def run(tex, rec_q):
            md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
            zf = jnp.zeros((P,), jnp.float32)
            zi = jnp.zeros((P,), jnp.int32)
            st0 = (jnp.full((P,), wf.EMPTY, jnp.int32),
                   jnp.zeros((P, 3), jnp.float32), zf, zf, zi, zi, zf,
                   jnp.zeros((P, 3), jnp.float32),
                   jnp.zeros((P, 3), jnp.float32),
                   jnp.full((P,), -1, jnp.int32))
            trace0 = jnp.zeros((r_trace + 1, P, 4), jnp.float32)
            thresh = max(1, P // 8)
            m_count = jnp.int32(n)

            def refill(carry):
                cursor, rt_i, trace, st = carry
                phase, p, t, t_p, i, aux, max_t, pp0, cci, oidx = st
                fin = phase == wf.FIN
                free = fin | (phase == wf.EMPTY)
                key = jnp.where(fin, oidx + 1, 0).astype(jnp.float32)
                row = jnp.stack([key, t, t_p, jnp.zeros_like(t)], axis=-1)
                trace = lax.dynamic_update_index_in_dim(trace, row, rt_i, 0)
                rank = jnp.cumsum(free.astype(jnp.int32)) - free
                qnew = cursor + rank
                take = free & (qnew < m_count)
                newrec = rec_q[jnp.clip(qnew, 0, rec_q.shape[0] - 1)]
                np0 = jnp.where(take[:, None], newrec[:, 0:3], pp0)
                nci = jnp.where(take[:, None], newrec[:, 3:6], cci)
                nmax = jnp.where(take, newrec[:, 6], max_t)
                noidx = jnp.where(take, newrec[:, 7].astype(jnp.int32),
                                  jnp.where(free, -1, oidx))
                nphase = jnp.where(take, wf.CLASSIFY,
                                   jnp.where(free, wf.EMPTY, phase))
                np_ = jnp.where(take[:, None], np0, p)
                nt = jnp.where(take, 0.0, t)
                ntp = jnp.where(take, 0.0, t_p)
                ni = jnp.where(take, 0, i)
                naux = jnp.where(take, 0, aux)
                cursor = jnp.minimum(cursor + free.sum(), m_count)
                st = (nphase, np_, nt, ntp, ni, naux, nmax, np0, nci, noidx)
                return cursor, rt_i + 1, trace, st

            def cond(c):
                r, cursor, rt_i, trace, st = c
                phase = st[0]
                marching = jnp.any((phase >= wf.CLASSIFY) & (phase < wf.FIN))
                return (r < 4096) & ((cursor < m_count) | marching)

            def body(c):
                r, cursor, rt_i, trace, st = c
                if gated:
                    free_n = ((st[0] == wf.FIN) | (st[0] == wf.EMPTY)).sum()
                    want = ((cursor < m_count) & (free_n >= thresh)
                            & (rt_i < r_trace))
                    cursor, rt_i, trace, st = lax.cond(
                        want, refill, lambda x: x, (cursor, rt_i, trace, st))
                else:
                    rt_cap = jnp.minimum(rt_i, r_trace)
                    cursor, rt_i, trace, st = refill(
                        (cursor, rt_cap, trace, st))
                for _ in range(spr):
                    st = wf._lane_step(md(st[1]), st, inv)
                return r + 1, cursor, rt_i, trace, st

            r, cursor, rt_i, trace, st = lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0), trace0, st0))
            phase, _, t, t_p, _, _, _, _, _, oidx = st
            fin = phase == wf.FIN
            key = jnp.where(fin, oidx + 1, 0).astype(jnp.float32)
            row = jnp.stack([key, t, t_p, jnp.zeros_like(t)], axis=-1)
            trace = lax.dynamic_update_index_in_dim(
                trace, row, jnp.minimum(rt_i, r_trace), 0)
            if not full_wb:
                return trace.sum(), r
            flat = trace.reshape(-1, 4)
            sel = jnp.nonzero(flat[:, 0] > 0.0, size=n, fill_value=0)[0]
            rows = flat[sel]
            ridx = rows[:, 0].astype(jnp.int32) - 1
            idx = jnp.where(ridx >= 0, ridx, n)
            out_t = jnp.zeros((n + 1,), jnp.float32).at[idx].set(
                rows[:, 1], mode="drop")[:n]
            return out_t, r

        return jax.jit(run)

    d1 = make_pool(gated=False, full_wb=False)
    d2 = make_pool(gated=True, full_wb=False)
    d3 = make_pool(gated=False, full_wb=True)

    ms, out = timeit(d1, tex, rec_q)
    print(f"D1 ungated, no-wb : {ms:8.1f} ms (rounds {int(out[1])})",
          flush=True)
    ms, out = timeit(d2, tex, rec_q)
    print(f"D2 gated,   no-wb : {ms:8.1f} ms (rounds {int(out[1])})",
          flush=True)
    ms, out = timeit(d3, tex, rec_q)
    print(f"D3 ungated, full-wb: {ms:8.1f} ms (rounds {int(out[1])})",
          flush=True)

    @jax.jit
    def d_full(tex, co, ci, mt):
        md = lambda q: rt.map_dist_packed(tex, q)  # noqa: E731
        return wf.intersect_water_wf(md, inv, co, ci, mt, pool=P, spr=spr,
                                     with_stats=True)

    ms, out = timeit(d_full, tex, co, ci, mt)
    print(f"D  shipped        : {ms:8.1f} ms  stats "
          f"{jax.tree_util.tree_map(int, out[2])}", flush=True)


if __name__ == "__main__":
    main()
