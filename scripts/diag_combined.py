"""Where do combined advect's 136 ms go?  pack vs gather vs weight math.
Also: the v3 windowed cell-table build + fused step."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.core import interp_combined as ic


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)
    return out


def main():
    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
    state = jax.device_put(init_state(cfg))
    dims = (cfg.nx, cfg.ny, cfg.nz)
    m = jnp.array(dims, jnp.float32)

    tab = timeit("pack_mac3_combined (51-stack)",
                 lambda s: ic.pack_mac3_combined(s.u, s.v, s.w), state)

    def pack_major(u, v, w):
        """stack on MAJOR axis + one transpose"""
        nx, ny, nz = dims
        nzk = nz - 1
        up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))
        vp = jnp.pad(v, ((1, 1), (0, 0), (0, 0)))
        wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0)))
        parts = []
        for dx in range(2):
            for dy in range(3):
                for dz in range(2):
                    parts.append(up[dx:dx+nx, dy:dy+ny, dz:dz+nzk])
        for dx in range(3):
            for dy in range(2):
                for dz in range(2):
                    parts.append(vp[dx:dx+nx, dy:dy+ny, dz:dz+nzk])
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    parts.append(wp[dx:dx+nx, dy:dy+ny, dz:dz+nzk])
        t = jnp.stack(parts, axis=0)  # (51, nx, ny, nzk)
        t = jnp.pad(t, ((0, 13), (0, 0), (0, 0), (0, 0)))
        return t.transpose(1, 2, 3, 0).reshape(nx * ny * nzk, 64)

    timeit("pack via major-stack + transpose",
           lambda s: pack_major(s.u, s.v, s.w), state)

    pq = state.pos * m

    timeit("interp only (gather + tiny-dim weights)",
           lambda t, p: jnp.stack(ic.interp_mac3_combined(
               t, dims, p[:, 0], p[:, 1], p[:, 2]), -1), tab, pq)

    def interp_lane64(t, pi, pj, pk):
        """weights as (N, 64) lane math (no tiny minor dims)"""
        nx, ny, nz = dims
        nzk = nz - 1
        iI, fI, nI = ic._split_normal(pi, nx)
        iJ, fJ, nJ = ic._split_normal(pj, ny)
        iK, fK, nK = ic._split_normal(pk, nz)
        iEI, fEI = ic._split_extended(pi, nx)
        iEJ, fEJ = ic._split_extended(pj, ny)
        iEK, fEK = ic._split_extended(pk, nz)
        key = (iEI.astype(jnp.int32) * ny + iEJ.astype(jnp.int32)) * nzk + iK.astype(jnp.int32)
        rows = t[key]  # (N, 64)
        # per-lane relative offsets (static tables)
        DX, DY, DZ, COMP = [], [], [], []
        for dx in range(2):
            for dy in range(3):
                for dz in range(2):
                    DX.append(dx); DY.append(dy - 1); DZ.append(dz); COMP.append(0)
        for dx in range(3):
            for dy in range(2):
                for dz in range(2):
                    DX.append(dx - 1); DY.append(dy); DZ.append(dz); COMP.append(1)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    DX.append(dx - 1); DY.append(dy - 1); DZ.append(dz); COMP.append(2)
        DX += [0] * 13; DY += [0] * 13; DZ += [0] * 13; COMP += [3] * 13
        DXa = jnp.asarray(DX, jnp.float32)[None, :]
        DYa = jnp.asarray(DY, jnp.float32)[None, :]
        DZa = jnp.asarray(DZ, jnp.float32)[None, :]
        Ca = jnp.asarray(COMP, jnp.int32)[None, :]
        # lane coordinate positions
        xpos = iEI[:, None] + DXa
        ypos = iEJ[:, None] + DYa
        zpos = iK[:, None] + DZa
        eI = iEI + fEI; eJ = iEJ + fEJ; eK = iEK + fEK
        # x weight: staggered (vs eI) for U, normal (vs nI) for V/W
        wx = jnp.where(Ca == 0,
                       jnp.maximum(0.0, 1.0 - jnp.abs(eI[:, None] - xpos)),
                       jnp.maximum(0.0, 1.0 - jnp.abs(nI[:, None] - xpos)))
        wy = jnp.where(Ca == 1,
                       jnp.maximum(0.0, 1.0 - jnp.abs(eJ[:, None] - ypos)),
                       jnp.maximum(0.0, 1.0 - jnp.abs(nJ[:, None] - ypos)))
        wz = jnp.where(Ca == 2,
                       jnp.maximum(0.0, 1.0 - jnp.abs(eK[:, None] - zpos)),
                       jnp.maximum(0.0, 1.0 - jnp.abs(nK[:, None] - zpos)))
        s = rows * wx * wy * wz
        uval = jnp.where(Ca == 0, s, 0.0).sum(-1)
        vval = jnp.where(Ca == 1, s, 0.0).sum(-1)
        wval = jnp.where(Ca == 2, s, 0.0).sum(-1)
        return uval, vval, wval

    out2 = timeit("interp lane64 (weights as (N,64) lane math)",
                  lambda t, p: jnp.stack(interp_lane64(
                      t, p[:, 0], p[:, 1], p[:, 2]), -1), tab, pq)
    out1 = jnp.stack(ic.interp_mac3_combined(tab, dims, pq[:, 0], pq[:, 1], pq[:, 2]), -1)
    err = jnp.abs(out1 - out2).max()
    print(f"lane64 vs reference max err: {float(err):.2e}")

    # v3 build + fused step
    from fluidsimulation_tpu.ops.celltable import build_cell_table
    from fluidsimulation_tpu.solver.step3d import step_jit

    timeit("build_cell_table v3 (windowed)",
           lambda s: build_cell_table(cfg, s.pos, s.vel).slots, state)
    dt = jnp.float32(1 / 60)
    timeit("FULL fused step (current code)",
           lambda s: step_jit(s, dt, cfg), state, n=5)


if __name__ == "__main__":
    main()
