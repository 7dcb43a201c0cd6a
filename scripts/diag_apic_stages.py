"""APIC step stage attribution at 64^3/953k (standalone timings).

Breaks the measured 316 ms/step into build_apic_table / p2g windows /
level set / project / packed g2p / advect so round-4 optimization
attacks the right stage.

Usage: python scripts/diag_apic_stages.py
"""
import sys, time
sys.path.insert(0, ".")
import jax
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.ops.advect import advect_rk3
from fluidsimulation_tpu.ops.apic import (
    build_apic_table,
    g2p_apic_packed,
    p2g_apic_from_table,
)
from fluidsimulation_tpu.ops.extrapolate import extrapolate_one_ring
from fluidsimulation_tpu.ops.forces import add_gravity
from fluidsimulation_tpu.ops.levelset import compute_level_set
from fluidsimulation_tpu.ops.project import project
from fluidsimulation_tpu.solver.apic import init_apic_state, step_apic_jit
from fluidsimulation_tpu.solver.step3d import clamp_dt


def fetch_scalar(out):
    # Device-side ravel + SCALAR fetch — np.asarray(whole array) would drag
    # the full buffer (200 MB table slots!) through the tunnel and dominate
    # the timing.
    jax.block_until_ready(out)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])


def timeit(name, fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    fetch_scalar(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        fetch_scalar(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:>22}: {1000*best:8.2f} ms")
    return out


def main():
    cfg = SimConfig()
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    s = jax.device_put(init_apic_state(cfg))
    for _ in range(8):  # warm state with real motion
        s = step_apic_jit(s, dt, cfg)
    jax.block_until_ready(s.pos)

    jadvect = jax.jit(lambda u, v, w, p: advect_rk3(cfg, u, v, w, p, dt,
                                                    packed=True))
    pos = timeit("advect", jadvect, s.u, s.v, s.w, s.pos)

    jls = jax.jit(lambda p: compute_level_set(cfg, p))
    phi, _ = timeit("level set", jls, pos)

    jbuild = jax.jit(lambda p, vl, C: build_apic_table(cfg, p, vl, C))
    table = timeit("build_apic_table", jbuild, pos, s.vel, s.C)

    jp2g = jax.jit(lambda t, p, vl, C: p2g_apic_from_table(cfg, t, p, vl, C))
    u, v, w, uv, vv, wv = timeit("p2g windows", jp2g, table, pos, s.vel, s.C)

    jext = jax.jit(lambda a, b: extrapolate_one_ring(a, b))
    u = jext(u, uv); v = jext(v, vv); w = jext(w, wv)
    v = add_gravity(cfg, v, dt)
    jproj = jax.jit(lambda u, v, w, phi: project(cfg, u, v, w, phi, dt))
    u, v, w, _ = timeit("project", jproj, u, v, w, phi)

    jg2p = jax.jit(lambda p, u, v, w: g2p_apic_packed(cfg, p, u, v, w))
    timeit("g2p packed", jg2p, pos, u, v, w)

    # fused whole step for reference
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            s = step_apic_jit(s, dt, cfg)
        jax.block_until_ready(s.pos)
        jax.device_get(np.asarray(s.vel).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"{'FUSED step':>22}: {1000*best:8.2f} ms")


if __name__ == "__main__":
    main()
