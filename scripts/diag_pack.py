"""Pack variants for interp_packed's tables at 128^3."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.core.interp_packed import pack_mac3, _segments, _S, _L


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
    print(f"{name:48s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)
    return out


def main():
    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    nx, ny, nz = 128, 128, 128

    timeit("pack_mac3 current (stack axis3, W transposed)",
           lambda s: pack_mac3(s.u, s.v, s.w), s)

    def pack_u_axis0(u):
        su = _segments(u)  # (nx+1, ny, ns, L)
        pu = jnp.stack(
            [su[0:nx, 0:ny-1], su[0:nx, 1:ny],
             su[1:nx+1, 0:ny-1], su[1:nx+1, 1:ny]], axis=0
        )  # (4, nx, ny-1, ns, L)
        pu = pu.transpose(1, 2, 3, 0, 4)
        return pu.reshape(-1, 4 * _L)

    timeit("U pack: stack axis0 + transpose", pack_u_axis0, s.u)

    def pack_u_cur(u):
        su = _segments(u)
        pu = jnp.stack(
            [su[0:nx, 0:ny-1], su[0:nx, 1:ny],
             su[1:nx+1, 0:ny-1], su[1:nx+1, 1:ny]], axis=3
        )
        return pu.reshape(-1, 4 * _L)

    timeit("U pack: current (stack axis3)", pack_u_cur, s.u)

    def pack_w_zlanes(w):
        # W with z-face lanes at stride 30 (covers iEK, iEK+1 for any iK in
        # the segment) — no input transpose.
        S2, L2 = 30, 32
        ns = (nz - 2) // S2 + 1
        pad = S2 * (ns - 1) + L2
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, pad - (nz + 1))))
        sw = jnp.stack([wp[..., S2*k : S2*k + L2] for k in range(ns)], axis=-2)
        pw = jnp.stack(
            [sw[0:nx-1, 0:ny-1], sw[0:nx-1, 1:ny],
             sw[1:nx, 0:ny-1], sw[1:nx, 1:ny]], axis=0
        ).transpose(1, 2, 3, 0, 4)
        return pw.reshape(-1, 4 * L2)

    timeit("W pack: z-lanes stride30 + axis0/transpose", pack_w_zlanes, s.w)

    def pack_w_cur(w):
        wt = jnp.transpose(w, (1, 2, 0))
        sw = _segments(wt)
        pw = jnp.stack(
            [sw[0:ny-1, 0:nz], sw[0:ny-1, 1:nz+1],
             sw[1:ny, 0:nz], sw[1:ny, 1:nz+1]], axis=3
        )
        return pw.reshape(-1, 4 * _L)

    timeit("W pack: current (input transpose + axis3)", pack_w_cur, s.w)


if __name__ == "__main__":
    main()
