"""Cumulative-prefix anatomy of build_super_table at 128^3 (TPU).

Mirrors scripts/attrib.py's method: jit(P_k) where P_k = the first k
internal stages of ops/supertable.build_super_table, marginal cost =
T_k - T_{k-1} (fusion effects included).  Finds which of the ~50 ms fused
build marginal (attrib 2026-08-18) is sort/counts floor vs movable
material (win interleave, row gather, mask, z-minor transpose).

Usage (TPU): python scripts/diag_build_super.py [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.common import cell_of
from fluidsimulation_tpu.ops.supertable import F, super_k


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, n=5):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / n * 1e3


def stages(cfg, upto):
    Ks = super_k(cfg)
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy, sz = nx // F[0], ny // F[1], nz // F[2]
    nsup = sx * sy * sz
    m = jnp.array([nx, ny, nz], jnp.float32)

    def f(pos, vel):
        pc = pos * m
        n = pc.shape[0]
        cell = cell_of(pc)
        lin = ((cell[:, 0] // F[0]) * sy + cell[:, 1] // F[1]) * sz + (
            cell[:, 2] // F[2]
        )
        idx = jnp.arange(n, dtype=jnp.int32)
        lin_s, perm = jax.lax.sort((lin, idx), num_keys=1, is_stable=True)
        if upto == "sort":
            return lin_s, perm
        payload = jnp.concatenate(
            [pc, vel, jnp.ones((n, 1), jnp.float32),
             jnp.zeros((n, 1), jnp.float32)], axis=1)
        payload_s = payload[perm]
        if upto == "perm":
            return lin_s, payload_s
        counts = jnp.zeros(nsup, jnp.int32).at[lin].add(1, mode="drop")
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
        if upto == "counts":
            return lin_s, payload_s, counts, starts
        pe = jnp.concatenate([payload_s, jnp.zeros((Ks, 8), jnp.float32)], 0)
        win = jnp.concatenate([pe[j: j + n] for j in range(Ks)], axis=1)
        if upto == "win":
            return counts, starts, win
        src = jnp.minimum(starts[:nsup], n - 1)
        rows = win[src].reshape(nsup, Ks, 8)
        if upto == "gather":
            return counts, rows
        kk = jnp.arange(Ks, dtype=jnp.int32)
        present = (kk[None, :] < counts[:, None]).astype(jnp.float32)
        rows = rows * present[..., None]
        rows = rows.at[:, :, 6].set(present)
        if upto == "mask":
            return rows
        slots = rows.reshape(sx, sy, sz, Ks, 8).transpose(0, 1, 3, 4, 2)
        return slots

    return jax.jit(f)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    print("backend", jax.default_backend(), "grid", grid, flush=True)
    prev = 0.0
    for name in ("sort", "perm", "counts", "win", "gather", "mask", "full"):
        t = timeit(stages(cfg, name), s.pos, s.vel)
        print(f"  upto {name:8s} {t:8.2f} ms   (marginal {t - prev:7.2f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
