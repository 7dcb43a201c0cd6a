"""Supercell (2x2x2) table feasibility: occupancy histograms at init and
settled states, plus a microbench of the supercell build pipeline vs the
per-cell v2 build at 128^3.

Saves the settled state to /tmp/settled128.npz for reuse.

Usage: python scripts/diag_super.py [grid] [steps]
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
from fluidsimulation_tpu.ops.common import cell_of
from fluidsimulation_tpu.solver.step3d import step_jit


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
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return out


def occupancy(cfg, pos, factor):
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    m = jnp.array([nx, ny, nz], jnp.float32)
    cell = cell_of(pos * m) // factor
    sx, sy, sz = nx // factor, ny // factor, nz // factor
    lin = (cell[:, 0] * sy + cell[:, 1]) * sz + cell[:, 2]
    counts = jnp.zeros(sx * sy * sz, jnp.int32).at[lin].add(1, mode="drop")
    c = np.asarray(counts)
    hist = np.bincount(c, minlength=1)
    return c.max(), hist


def report(cfg, pos, tag):
    for factor in (1, 2, 4):
        mx, hist = occupancy(cfg, pos, factor)
        tail = {k: int(hist[k:].sum()) for k in
                (5, 9, 13, 17, 25, 33) if k < len(hist) + 1}
        print(f"{tag} factor={factor}: max={mx} tail_counts(>=k)={tail}",
              flush=True)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    dt = 1.0 / 60.0
    state = jax.device_put(init_state(cfg))
    report(cfg, state.pos, "init   ")

    cache = f"/tmp/settled{grid}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        pos_settled = jnp.asarray(d["pos"])
        vel_settled = jnp.asarray(d["vel"])
        print(f"loaded settled state from {cache}", flush=True)
    else:
        t0 = time.perf_counter()
        for i in range(steps):
            state = step_jit(state, dt, cfg)
        fetch(state)
        print(f"{steps} steps in {time.perf_counter()-t0:.0f}s", flush=True)
        pos_settled, vel_settled = state.pos, state.vel
        np.savez(cache, pos=np.asarray(pos_settled), vel=np.asarray(vel_settled))
    report(cfg, pos_settled, "settled")

    # ---- supercell build pipeline microbench (settled state) -------------
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy, sz = nx // 2, ny // 2, nz // 2
    nsup = sx * sy * sz
    pos, vel = pos_settled, vel_settled
    n = pos.shape[0]
    m = jnp.array([nx, ny, nz], jnp.float32)
    Ks = 8 * cfg.particles_per_cell_axis ** 3 + 4

    def keys(pos):
        sc = cell_of(pos * m) // 2
        return (sc[:, 0] * sy + sc[:, 1]) * sz + sc[:, 2]

    lin = timeit("super keys", keys, pos)
    idx = jnp.arange(n, dtype=jnp.int32)
    lin_s, perm = timeit(
        "sort (stable 1-key)",
        lambda l: jax.lax.sort((l, idx), num_keys=1, is_stable=True), lin)

    payload = jnp.concatenate(
        [pos * m, vel, jnp.ones((n, 1), jnp.float32),
         jnp.zeros((n, 1), jnp.float32)], axis=1)
    payload_s = timeit("payload[perm]", lambda p: p[perm], payload)

    def starts_fn(lin):
        counts = jnp.zeros(nsup, jnp.int32).at[lin].add(1, mode="drop")
        return jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])

    starts = timeit("starts (hist+cumsum)", starts_fn, lin)

    def gather_rows(payload_s):
        pe = jnp.concatenate(
            [payload_s, jnp.zeros((Ks, 8), jnp.float32)], axis=0)
        win = jnp.concatenate([pe[j: j + n] for j in range(Ks)], axis=1)
        src = jnp.minimum(starts[:nsup], n - 1)
        return win[src].reshape(nsup, Ks, 8)

    rows = timeit(f"windowed per-supercell gather (Ks={Ks})",
                  gather_rows, payload_s)

    def mask_transpose(rows):
        counts = starts[1:] - starts[:-1]
        kk = jnp.arange(Ks, dtype=jnp.int32)
        present = (kk[None, :] < counts[:, None]).astype(jnp.float32)
        r = rows * present[..., None]
        r = r.at[:, :, 6].set(present)
        return r.reshape(sx, sy, sz, Ks, 8).transpose(0, 1, 3, 4, 2)

    slots = timeit("mask + transpose to z-minor", mask_transpose, rows)
    print("slots shape/bytes:", slots.shape, slots.size * 4 / 1e6, "MB")

    # whole supercell build fused
    def build_all(pos, vel):
        lin = keys(pos)
        lin_s, perm = jax.lax.sort((lin, idx), num_keys=1, is_stable=True)
        payload = jnp.concatenate(
            [pos * m, vel, jnp.ones((n, 1), jnp.float32),
             jnp.zeros((n, 1), jnp.float32)], axis=1)
        payload_s = payload[perm]
        counts = jnp.zeros(nsup, jnp.int32).at[lin].add(1, mode="drop")
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
        pe = jnp.concatenate([payload_s, jnp.zeros((Ks, 8), jnp.float32)], axis=0)
        win = jnp.concatenate([pe[j: j + n] for j in range(Ks)], axis=1)
        src = jnp.minimum(starts[:nsup], n - 1)
        rows = win[src].reshape(nsup, Ks, 8)
        kk = jnp.arange(Ks, dtype=jnp.int32)
        present = (kk[None, :] < counts[:, None]).astype(jnp.float32)
        rows = rows * present[..., None]
        rows = rows.at[:, :, 6].set(present)
        return rows.reshape(sx, sy, sz, Ks, 8).transpose(0, 1, 3, 4, 2)

    timeit("SUPERCELL BUILD fused", build_all, pos, vel)

    from fluidsimulation_tpu.ops.celltable import build_cell_table
    timeit("current per-cell build (v2)",
           lambda p, v: build_cell_table(cfg, p, v), pos, vel)


if __name__ == "__main__":
    sys.exit(main())
