"""Same-process A/B experiments at 128^3/1M: sort key formulations, counts
dtypes, and a no-transpose W pack.  All candidates measured against the
production formulation in the same process (the tunnel TPU drifts between
performance states across processes; only intra-process ratios are
trustworthy)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.core.interp_packed import _segments, _nseg, _L, pack_mac3
from fluidsimulation_tpu.ops.common import cell_of
from fluidsimulation_tpu.ops.supertable import F, _sdims


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
    print(f"{name:56s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)
    return out


def main():
    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    nx, ny, nz = 128, 128, 128
    sx, sy, sz = _sdims(cfg)
    nsup = sx * sy * sz
    m = jnp.array([nx, ny, nz], jnp.float32)
    n = s.pos.shape[0]
    pc = s.pos * m
    cell = cell_of(pc)
    lin = ((cell[:, 0] // F[0]) * sy + cell[:, 1] // F[1]) * sz + cell[:, 2] // F[2]
    lin = jax.device_put(jax.jit(lambda x: x)(lin))
    idx = jnp.arange(n, dtype=jnp.int32)

    # -- sort formulations --
    timeit("sort A: (key,idx) num_keys=1 stable [prod]",
           lambda k: jax.lax.sort((k, idx), num_keys=1, is_stable=True), lin)

    def sort_i64(k):
        packed = k.astype(jnp.int64) << 20 | idx.astype(jnp.int64)
        srt = jax.lax.sort(packed)
        return (srt >> 20).astype(jnp.int32), (srt & 0xFFFFF).astype(jnp.int32)

    timeit("sort B: packed int64 single key", sort_i64, lin)

    def sort_f32(k):
        # key*2^? — 19-bit key + can't fit idx in f32; just key-only unstable
        return jax.lax.sort(k)

    timeit("sort C: key-only int32 (lower bound)", sort_f32, lin)

    def sort_2key(k):
        return jax.lax.sort((k, idx), num_keys=2)

    timeit("sort D: (key,idx) num_keys=2", sort_2key, lin)

    # -- counts formulations --
    timeit("counts A: i32 scatter-add [prod]",
           lambda l: jnp.zeros(nsup, jnp.int32).at[l].add(1, mode="drop"), lin)
    timeit("counts B: u8 scatter-add",
           lambda l: jnp.zeros(nsup, jnp.uint8).at[l].add(1, mode="drop"), lin)
    lin_s, perm = jax.jit(lambda k: jax.lax.sort((k, idx), num_keys=1,
                                                 is_stable=True))(lin)
    fetch(lin_s)

    def counts_from_sorted(ls):
        # segment boundaries in the sorted key array -> starts via searchsorted
        flags = jnp.concatenate([jnp.ones(1, jnp.int32),
                                 (ls[1:] != ls[:-1]).astype(jnp.int32)])
        return flags.sum()  # representative cost of boundary detection only

    timeit("counts C: boundary flags (partial)", counts_from_sorted, lin_s)

    # -- W pack without input transpose (z-face lanes) --
    def pack_w_zlanes(w):
        # corners x in {iI, iI+1}, y in {iJ, iJ+1}; lanes = z-FACES with
        # windows covering iEK, iEK+1 (extended index in [0, nz-1+1]).
        sw = _segments(w)  # (nx, ny, ns', L) over nz+1 faces
        pw = jnp.stack(
            [sw[0:nx - 1, 0:ny - 1], sw[0:nx - 1, 1:ny],
             sw[1:nx, 0:ny - 1], sw[1:nx, 1:ny]],
            axis=3,
        )
        return pw.reshape(-1, 4 * _L)

    timeit("W pack: z-face lanes, no transpose", pack_w_zlanes, s.w)

    def pack_w_cur(w):
        wt = jnp.transpose(w, (1, 2, 0))
        sw = _segments(wt)
        pw = jnp.stack(
            [sw[0:ny - 1, 0:nz], sw[0:ny - 1, 1:nz + 1],
             sw[1:ny, 0:nz], sw[1:ny, 1:nz + 1]],
            axis=3,
        )
        return pw.reshape(-1, 4 * _L)

    timeit("W pack: current (transpose + axis3)", pack_w_cur, s.w)

    # -- full pack variants --
    timeit("pack_mac3 [prod]", lambda st: pack_mac3(st.u, st.v, st.w), s)

    def pack_mac3_wz(u, v, w):
        su = _segments(u)
        pu = jnp.stack(
            [su[0:nx, 0:ny - 1], su[0:nx, 1:ny],
             su[1:nx + 1, 0:ny - 1], su[1:nx + 1, 1:ny]], axis=3
        ).reshape(-1, 4 * _L)
        sv = _segments(v)
        pv = jnp.stack(
            [sv[0:nx - 1, 0:ny], sv[0:nx - 1, 1:ny + 1],
             sv[1:nx, 0:ny], sv[1:nx, 1:ny + 1]], axis=3
        ).reshape(-1, 4 * _L)
        pw = pack_w_zlanes(w)
        return pu, pv, pw

    timeit("pack_mac3 with z-lane W", lambda st: pack_mac3_wz(st.u, st.v, st.w), s)


if __name__ == "__main__":
    main()
