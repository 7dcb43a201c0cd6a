"""md() probe cost vs batch size and packed-row format, on the live backend.

The wavefront pool restores large march batches, which re-opens the
PackedPhi8 (8-lane-row) option that lost at the tiled renderer's 6-26k-row
batches (scripts/diag_phi8.py).  Times K chained md calls (each depends on
the previous — the pool's access pattern) per format and batch size, plus
a stripped pool-march loop to isolate refill/trace overhead.

Usage: python scripts/microbench_wfmd.py [grid] [steps]
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
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    print(f"backend {jax.default_backend()}, grid {grid}^3", flush=True)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    fetch(state.phi)
    tex = rt.PackedPhi(state.phi)
    tex8 = rt.PackedPhi8(state.phi)

    K = 32

    @functools.partial(jax.jit, static_argnames=("fmt",))
    def chain(tex, p, fmt):
        mdf = rt.map_dist_packed if fmt == "p" else rt.map_dist_packed8
        acc = jnp.zeros(p.shape[:-1], jnp.float32)
        for _ in range(K):
            dt = mdf(tex, p)
            acc = acc + dt
            p = p + dt[..., None] * jnp.float32(0.001)
        return acc

    rng = np.random.default_rng(0)
    for nb in (16384, 65536, 131072, 262144):
        pts = jnp.asarray(rng.uniform(0.1, 0.9, (nb, 3)).astype(np.float32))
        for fmt, t in (("p", tex), ("p8", tex8)):
            out = chain(t, pts, fmt)
            fetch(out)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(3):
                    out = chain(t, pts, fmt)
                    fetch(out)
                best = min(best, (time.perf_counter() - t0) / 3)
            per = best / K / nb * 1e9
            print(f"batch {nb:7d} {fmt:3s}: {best*1e3:8.2f} ms per chain "
                  f"({per:6.2f} ns/row/call)", flush=True)

    # Stripped pool march: lane-step + md, no refill/trace/cond — the
    # pool's irreducible per-round cost.
    from fluidsimulation_tpu.experiments import wavefront as wf

    @functools.partial(jax.jit, static_argnames=("fmt", "rounds", "spr"))
    def bare_pool(tex, p0, ci, mt, fmt, rounds, spr):
        mdf = rt.map_dist_packed if fmt == "p" else rt.map_dist_packed8
        md = lambda q: mdf(tex, q)  # noqa: E731
        P = p0.shape[0]
        st = (jnp.full((P,), wf.CLASSIFY, jnp.int32), p0,
              jnp.zeros(P), jnp.zeros(P), jnp.zeros(P, jnp.int32),
              jnp.zeros(P, jnp.int32), mt, p0, ci,
              jnp.zeros(P, jnp.int32))
        inv = 1.0 / jnp.float32(tex.dims[0])

        def body(i, st):
            for _ in range(spr):
                st = wf._lane_step(md(st[1]), st, inv)
            return st

        st = jax.lax.fori_loop(0, rounds, body, st)
        return st[2]

    P = 131072
    co = jnp.asarray(rng.uniform(-0.4, 0.4, (P, 3)).astype(np.float32))
    ci = rng.normal(size=(P, 3)).astype(np.float32)
    ci /= np.linalg.norm(ci, axis=1, keepdims=True)
    ci = jnp.asarray(ci)
    half = jnp.array([0.5, 0.5, 0.5], jnp.float32)
    _, mt, _, _ = rt.intersect_aabb(co, ci, -half, half)
    p0 = co + 0.5
    for fmt, t in (("p", tex), ("p8", tex8)):
        out = bare_pool(t, p0, ci, mt, fmt, 16, 6)
        fetch(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = bare_pool(t, p0, ci, mt, fmt, 16, 6)
            fetch(out)
            best = min(best, time.perf_counter() - t0)
        per = best / (16 * 6) / P * 1e9
        print(f"bare pool {fmt:3s} (96 steps x 131k): {best*1e3:8.2f} ms "
              f"({per:6.2f} ns/lane-step)", flush=True)


if __name__ == "__main__":
    main()
