"""Probe each Pallas kernel's Mosaic compile at a given grid (default 256^3)
to locate which one the remote compile helper rejects.  Each probe jits the
kernel wrapper on dummy inputs and forces a real compile + tiny execute.
"""
import sys, time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cfg = SimConfig(nx=n, ny=n, nz=n, cells_per_meter=float(n),
                particles_per_cell_axis=1)
print("backend:", jax.default_backend(), "grid:", n)


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        jax.device_get(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        print(f"{name}: OK ({time.perf_counter()-t0:.1f}s)")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:220]
        print(f"{name}: FAIL ({time.perf_counter()-t0:.1f}s): {msg}")


def p_sweep():
    from fluidsimulation_tpu.ops.pallas_sweep import sweep_closest_pallas
    phi = jnp.full((n, n, n), 1e9, jnp.float32)
    cpos = jnp.full((n, n, n, 3), 1e6, jnp.float32)
    return jax.jit(lambda p, c: sweep_closest_pallas(cfg, p, c)[0])(phi, cpos)


def p_seed():
    from fluidsimulation_tpu.ops.pallas_seed import neighborhood_pass_pallas
    cpos = jnp.full((n, n, n, 3), 1e6, jnp.float32)
    return jax.jit(lambda c: neighborhood_pass_pallas(cfg, c)[0])(cpos)


def p_p2g_super():
    from fluidsimulation_tpu.ops.supertable import SuperTable, super_k
    from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_from_super_pallas
    ks = super_k(cfg)
    sx, sy, sz = n // 2, n // 2, n
    slots = jnp.zeros((sx, sy, ks, 8, sz), jnp.float32)
    st = SuperTable(slots=slots, n_overflow=jnp.int32(0),
                    overflow_idx=jnp.full((16,), 10, jnp.int32))
    return jax.jit(lambda s: p2g_from_super_pallas(cfg, s, None, None)[0])(st)


def p_pairpack():
    from fluidsimulation_tpu.core.pallas_pairpack import pack_mac3_pair_pallas
    u = jnp.zeros((n + 1, n, n), jnp.float32)
    v = jnp.zeros((n, n + 1, n), jnp.float32)
    w = jnp.zeros((n, n, n + 1), jnp.float32)
    return jax.jit(
        lambda a, b, c: pack_mac3_pair_pallas((a, b, c), (a, b, c))[0]
    )(u, v, w)


which = sys.argv[2] if len(sys.argv) > 2 else "all"
probes = {"sweep": p_sweep, "seed": p_seed, "p2g": p_p2g_super,
          "pairpack": p_pairpack}
for k, f in probes.items():
    if which in ("all", k):
        probe(k, f)
