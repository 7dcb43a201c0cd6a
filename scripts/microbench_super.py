"""Supercell consumers vs per-cell table paths at 128^3 on settled state.

Uses /tmp/settled128.npz (made by diag_super.py) or falls back to init.

Usage: python scripts/microbench_super.py [grid] [Ks]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops import celltable as ct
from fluidsimulation_tpu.ops import supertable as st
from fluidsimulation_tpu.ops.levelset import FAR


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=5, static=()):
    f = jax.jit(fn, static_argnums=static)
    out = f(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    ks = int(sys.argv[2]) if len(sys.argv) > 2 else st.super_k(cfg)
    cache = f"/tmp/settled{grid}_exact.npz"
    if not os.path.exists(cache):
        cache = f"/tmp/settled{grid}.npz"
    if len(sys.argv) > 3 and sys.argv[3] == "init":
        cache = "/nonexistent"
    if os.path.exists(cache):
        d = np.load(cache)
        pos = jnp.asarray(d["pos"])
        vel = jnp.asarray(d["vel"])
        print(f"state: {cache}")
    else:
        s = jax.device_put(init_state(cfg))
        pos, vel = s.pos, s.vel
        print("state: init")

    # Builds
    tbl = timeit("cell build v2", lambda p, v: ct.build_cell_table(cfg, p, v),
                 pos, vel)
    sup = timeit(f"super build (Ks={ks})",
                 lambda p, v: st.build_super_table(cfg, p, v, ks=ks), pos, vel)
    print("n_overflow cell:", int(tbl.n_overflow), "super:",
          int(sup.n_overflow))

    # Seeds
    timeit("seed cell", lambda t: ct.seed_closest_from_table(cfg, t, FAR), tbl)
    timeit("seed super", lambda t: st.seed_closest_from_super(cfg, t, FAR), sup)

    # P2G
    from fluidsimulation_tpu.ops.pallas_p2g import p2g_from_table_pallas

    if jax.default_backend() == "tpu":
        timeit("p2g cell pallas",
               lambda t, p, v: p2g_from_table_pallas(cfg, t, p, v),
               tbl, pos, vel)
    timeit("p2g cell xla fused",
           lambda t, p, v: ct.p2g_from_table_fused(cfg, t, p, v),
           tbl, pos, vel)
    timeit("p2g super xla",
           lambda t, p, v: st.p2g_from_super(cfg, t, p, v), sup, pos, vel)
    from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_from_super_pallas

    try:
        got = timeit("p2g super pallas",
                     lambda t, p, v: p2g_from_super_pallas(cfg, t, p, v),
                     sup, pos, vel)
        want = jax.jit(lambda t, p, v: st.p2g_from_super(cfg, t, p, v))(
            sup, pos, vel)
        for i in range(3):
            valid = np.asarray(want[3 + i])
            np.testing.assert_array_equal(np.asarray(got[3 + i]), valid)
            np.testing.assert_allclose(
                np.asarray(got[i])[valid], np.asarray(want[i])[valid],
                rtol=2e-4, atol=2e-4)
        print("p2g super pallas == xla  OK", flush=True)
        have_pallas_super = True
    except Exception as e:  # Mosaic compile/runtime failures
        print(f"p2g super pallas FAILED: {type(e).__name__}: {e}", flush=True)
        have_pallas_super = False

    # end-to-end front halves: build+seed+p2g
    def front_cell(p, v):
        t = ct.build_cell_table(cfg, p, v)
        phi0, cpos0 = ct.seed_closest_from_table(cfg, t, FAR)
        phi0, cpos0 = ct.seed_overflow_correction(cfg, t, p, phi0, cpos0)
        if jax.default_backend() == "tpu":
            g = p2g_from_table_pallas(cfg, t, p, v)
        else:
            g = ct.p2g_from_table(cfg, t, p, v)
        return phi0, cpos0, g

    def front_super(p, v):
        t = st.build_super_table(cfg, p, v, ks=ks)
        phi0, cpos0 = st.seed_closest_from_super(cfg, t, FAR)
        phi0, cpos0 = st.seed_overflow_correction(cfg, t, p, phi0, cpos0)
        g = st.p2g_from_super(cfg, t, p, v)
        return phi0, cpos0, g

    timeit("FRONT cell (build+seed+p2g, pallas p2g)", front_cell, pos, vel)
    timeit("FRONT super (build+seed+p2g)", front_super, pos, vel)

    if have_pallas_super:
        def front_super_pallas(p, v):
            t = st.build_super_table(cfg, p, v, ks=ks)
            phi0, cpos0 = st.seed_closest_from_super(cfg, t, FAR)
            phi0, cpos0 = st.seed_overflow_correction(cfg, t, p, phi0, cpos0)
            g = p2g_from_super_pallas(cfg, t, p, v)
            return phi0, cpos0, g

        timeit("FRONT super (pallas p2g)", front_super_pallas, pos, vel)


if __name__ == "__main__":
    sys.exit(main())
