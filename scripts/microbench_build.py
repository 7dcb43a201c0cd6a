"""Microbench the cell-table build internals at the bench config (128^3/1M),
plus candidate replacements (windowed per-cell gather).

Usage: python scripts/microbench_build.py [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.common import cell_of


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
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(
        nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
        particles_per_cell_axis=1 if grid >= 128 else 2,
    )
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    K = cfg.particles_per_cell_axis ** 3 + 4
    ncells = nx * ny * nz
    state = jax.device_put(init_state(cfg))
    pos, vel = state.pos, state.vel
    n = pos.shape[0]
    print(f"grid {grid}^3, N={n}, K={K}, ncells={ncells}")

    m = jnp.array([nx, ny, nz], jnp.float32)

    def keys(pos):
        pc = pos * m
        cell = cell_of(pc)
        return (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]

    lin = timeit("keys", keys, pos)
    idx = jnp.arange(n, dtype=jnp.int32)

    lin_s, perm = timeit(
        "lax.sort pairs", lambda l: jax.lax.sort((l, idx), num_keys=2), lin
    )

    def runstart(lin_s):
        changes = jnp.concatenate([jnp.ones(1, bool), lin_s[1:] != lin_s[:-1]])
        run_start = jnp.where(changes, idx, 0)
        k = 1
        while k < n:
            run_start = jnp.maximum(run_start, jnp.pad(run_start, (k, 0))[:n])
            k *= 2
        return idx - run_start

    rank_s = timeit("rank (Hillis-Steele)", runstart, lin_s)

    payload = jnp.concatenate(
        [pos * m, vel, jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 1), jnp.float32)],
        axis=1,
    )

    payload_s = timeit("payload[perm] (1M-row gather)", lambda p: p[perm], payload)

    slot_s = jnp.where(rank_s < K, lin_s * K + rank_s, ncells * K)

    def src_scatter(perm):
        return (
            jnp.full(ncells * K, n, jnp.int32)
            .at[slot_s]
            .set(perm, mode="drop", unique_indices=True)
        )

    src = timeit("src scatter (1M elem -> 10.5M)", src_scatter, perm)

    def big_gather(payload):
        pe = jnp.concatenate([payload, jnp.zeros((1, 8), jnp.float32)], axis=0)
        return pe[src].reshape(nx, ny, nz, K, 8)

    tab = timeit("payload_ext[src] (ncells*K-row gather)", big_gather, payload)

    timeit("transpose to z-minor", lambda t: t.transpose(0, 1, 3, 4, 2), tab)

    def row_scatter(p_s):
        return (
            jnp.zeros((ncells * K, 8), jnp.float32)
            .at[slot_s]
            .set(p_s, mode="drop", unique_indices=True)
        )

    timeit("row scatter (1M x 8 rows)", row_scatter, payload_s)

    # ---- candidate v2: windowed per-cell gather --------------------------
    def starts_fill(lin_s):
        # first-occurrence scatter + suffix-min fill
        changes = jnp.concatenate([jnp.ones(1, bool), lin_s[1:] != lin_s[:-1]])
        first = jnp.where(changes, idx, 0)
        st = (
            jnp.full(ncells + 1, n, jnp.int32)
            .at[jnp.where(changes, lin_s, ncells)]
            .min(jnp.where(changes, idx, n), mode="drop")
        )
        st = st.at[ncells].set(n)
        # backward fill: start of empty cell = start of next nonempty
        k = 1
        while k < ncells + 1:
            st = jnp.minimum(st, jnp.pad(st, (0, k), constant_values=n)[k:])
            k *= 2
        return st

    starts = timeit("starts (scatter-min + suffix fill)", starts_fill, lin_s)

    def windowed(p_s):
        # (N+K, 8) padded, stacked shifted views -> (N, K, 8)
        pe = jnp.concatenate([p_s, jnp.zeros((K, 8), jnp.float32)], axis=0)
        win = jnp.stack([pe[k : k + n] for k in range(K)], axis=1)
        return win.reshape(n, K * 8)

    pwin = timeit("windowed payload (N x K*8)", windowed, payload_s)

    def cell_gather(pwin):
        st = jnp.minimum(starts[:ncells], n - 1)
        rows = pwin[st]  # (ncells, K*8) one row gather per cell
        return rows.reshape(nx, ny, nz, K, 8)

    tab2 = timeit("per-cell windowed gather (ncells rows)", cell_gather, pwin)

    def mask_and_transpose(tab2):
        cnt = (starts[1:] - starts[:ncells]).reshape(nx, ny, nz)
        kk = jnp.arange(K, dtype=jnp.int32)
        present = (kk[None, None, None, :] < cnt[..., None]).astype(jnp.float32)
        t = tab2 * present[..., None]
        t = t.at[..., 6].set(present)
        return t.transpose(0, 1, 3, 4, 2)

    tab2t = timeit("mask + transpose", mask_and_transpose, tab2)

    def full_v2(pos, vel):
        pc = pos * m
        cell = cell_of(pc)
        lin = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
        lin_s, perm = jax.lax.sort((lin, idx), num_keys=2)
        payload = jnp.concatenate(
            [pc, vel, jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 1), jnp.float32)],
            axis=1,
        )
        p_s = payload[perm]
        st = starts_fill(lin_s)
        pe = jnp.concatenate([p_s, jnp.zeros((K, 8), jnp.float32)], axis=0)
        win = jnp.stack([pe[k : k + n] for k in range(K)], axis=1).reshape(n, K * 8)
        stc = jnp.minimum(st[:ncells], n - 1)
        rows = win[stc].reshape(nx, ny, nz, K, 8)
        cnt = (st[1:] - st[:ncells]).reshape(nx, ny, nz)
        kk = jnp.arange(K, dtype=jnp.int32)
        present = (kk[None, None, None, :] < cnt[..., None]).astype(jnp.float32)
        rows = rows * present[..., None]
        rows = rows.at[..., 6].set(present)
        return rows.transpose(0, 1, 3, 4, 2)

    timeit("FULL v2 build", full_v2, pos, vel)

    from fluidsimulation_tpu.ops.celltable import build_cell_table

    timeit(
        "FULL v1 build (current)",
        lambda p, v: build_cell_table(cfg, p, v).slots,
        pos, vel,
    )


if __name__ == "__main__":
    main()
