"""A/B: find_overflow rank via starts[lin_s] 1M-row gather (old) vs the
shift-compare rank_ge mask (new), inside build_super_table, on a WARM
dam-break state where n_overflow > 0 so the lax.cond branch actually runs.

Asserts overflow_idx equality, then times the full build both ways in one
process.  Usage (TPU): python scripts/diag_overflow_ab.py [grid] [warm]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.common import cell_of
from fluidsimulation_tpu.ops.supertable import F, build_super_table, super_k
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    print(f"  {name:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


def build_old(cfg, pos, vel, overflow_cap=4096):
    """The pre-fix formulation (starts-gather rank), kept inline for A/B."""
    Ks = super_k(cfg)
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy, sz = nx // F[0], ny // F[1], nz // F[2]
    nsup = sx * sy * sz
    m = jnp.array([nx, ny, nz], jnp.float32)
    pc = pos * m
    n = pc.shape[0]
    cell = cell_of(pc)
    lin = ((cell[:, 0] // F[0]) * sy + cell[:, 1] // F[1]) * sz + (
        cell[:, 2] // F[2])
    idx = jnp.arange(n, dtype=jnp.int32)
    lin_s, perm = jax.lax.sort((lin, idx), num_keys=1, is_stable=True)
    payload = jnp.concatenate(
        [pc, vel, jnp.ones((n, 1), jnp.float32),
         jnp.zeros((n, 1), jnp.float32)], axis=1)
    payload_s = payload[perm]
    counts = jnp.zeros(nsup, jnp.int32).at[lin].add(1, mode="drop")
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
    pe = jnp.concatenate([payload_s, jnp.zeros((Ks, 8), jnp.float32)], 0)
    win = jnp.concatenate([pe[j: j + n] for j in range(Ks)], axis=1)
    src = jnp.minimum(starts[:nsup], n - 1)
    rows = win[src].reshape(nsup, Ks, 8)
    kk = jnp.arange(Ks, dtype=jnp.int32)
    present = (kk[None, :] < counts[:, None]).astype(jnp.float32)
    rows = rows * present[..., None]
    rows = rows.at[:, :, 6].set(present)
    slots = rows.reshape(sx, sy, sz, Ks, 8).transpose(0, 1, 3, 4, 2)
    n_overflow = (n - jnp.minimum(counts, Ks).sum()).astype(jnp.int32)
    cap = min(overflow_cap, n)

    def find_overflow(_):
        rank_s = idx - starts[jnp.minimum(lin_s, nsup)]
        over = rank_s >= Ks
        (pos_s,) = jnp.nonzero(over, size=cap, fill_value=n)
        return jnp.where(pos_s < n, perm[jnp.minimum(pos_s, n - 1)],
                         n).astype(jnp.int32)

    overflow_idx = jax.lax.cond(
        n_overflow > 0, find_overflow,
        lambda _: jnp.full(cap, n, jnp.int32) + 0 * perm[:1], operand=None)
    return slots, n_overflow, overflow_idx


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    dt = jnp.float32(1 / 60)
    s = jax.device_put(init_state(cfg))
    for _ in range(warm):
        s = step_jit(s, dt, cfg)
    fetch(s)
    print("backend", jax.default_backend(), "grid", grid, "warm", warm,
          flush=True)

    f_old = jax.jit(lambda p, v: build_old(cfg, p, v))
    f_new = jax.jit(lambda p, v: build_super_table(cfg, p, v))
    so, no, oo = f_old(s.pos, s.vel)
    tn = f_new(s.pos, s.vel)
    print(f"  n_overflow = {int(no)}  (want > 0 for a live A/B)", flush=True)
    assert int(no) == int(tn.n_overflow)
    import numpy as np
    eq_idx = np.array_equal(np.asarray(oo), np.asarray(tn.overflow_idx))
    eq_slots = np.array_equal(np.asarray(so), np.asarray(tn.slots))
    print(f"  overflow_idx equal: {eq_idx}   slots equal: {eq_slots}",
          flush=True)
    assert eq_idx and eq_slots

    for rnd in range(2):
        timeit("build OLD (starts-gather rank)", f_old, s.pos, s.vel)
        timeit("build NEW (rank_ge shift-compare)", f_new, s.pos, s.vel)


if __name__ == "__main__":
    main()
