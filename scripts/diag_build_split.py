"""Cost split of build_super_table at 128^3: sort / payload gather / counts /
window interleave / row gather / transpose."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.common import cell_of
from fluidsimulation_tpu.ops.supertable import F, super_k, _sdims


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
    s = jax.device_put(init_state(cfg))
    Ks = super_k(cfg)
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy, sz = _sdims(cfg)
    nsup = sx * sy * sz
    m = jnp.array([nx, ny, nz], jnp.float32)
    n = s.pos.shape[0]
    print(f"n={n} nsup={nsup} Ks={Ks}")

    def keys(pos):
        pc = pos * m
        cell = cell_of(pc)
        return ((cell[:, 0] // F[0]) * sy + cell[:, 1] // F[1]) * sz + cell[:, 2] // F[2]

    lin = timeit("keys", keys, s.pos)
    idx = jnp.arange(n, dtype=jnp.int32)

    def dosort(lin):
        return jax.lax.sort((lin, idx), num_keys=1, is_stable=True)

    lin_s, perm = timeit("stable sort (key, idx)", dosort, lin)

    def payload_of(pos, vel):
        pc = pos * m
        return jnp.concatenate(
            [pc, vel, jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 1), jnp.float32)], axis=1)

    payload = timeit("payload concat", payload_of, s.pos, s.vel)
    payload_s = timeit("payload gather [perm] (8-lane rows)",
                       lambda p, q: p[q], payload, perm)

    def starts_of(lin):
        counts = jnp.zeros(nsup, jnp.int32).at[lin].add(1, mode="drop")
        return jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]), counts

    (starts, counts) = timeit("counts scatter + cumsum starts", starts_of, lin)

    def win_of(payload_s):
        pe = jnp.concatenate([payload_s, jnp.zeros((Ks, 8), jnp.float32)], axis=0)
        return jnp.concatenate([pe[j : j + n] for j in range(Ks)], axis=1)

    win = timeit("window interleave concat (n, Ks*8)", win_of, payload_s)

    src = jnp.minimum(starts[:nsup], n - 1)
    rows = timeit("row gather (nsup x Ks*8 lanes)", lambda w, s_: w[s_],
                  win, src).reshape(nsup, Ks, 8)

    def finish(rows, counts):
        kk = jnp.arange(Ks, dtype=jnp.int32)
        present = (kk[None, :] < counts[:, None]).astype(jnp.float32)
        r = rows * present[..., None]
        r = r.at[:, :, 6].set(present)
        return r.reshape(sx, sy, sz, Ks, 8).transpose(0, 1, 3, 4, 2)

    timeit("mask + set + transpose to (sx,sy,Ks,8,sz)", finish, rows, counts)

    from fluidsimulation_tpu.ops.supertable import build_super_table
    timeit("FULL build_super_table", lambda p, v: build_super_table(cfg, p, v).slots,
           s.pos, s.vel)


if __name__ == "__main__":
    main()
