"""CPU-mesh work-scaling measurement for the multi-chip step (VERDICT r2
item 6): wall-clock halo step vs GSPMD step, plus a per-shard pack-work
A/B (sharded 1/D pack vs every-shard-full-domain pack) at a 128^3-shaped
shard.

Runs on the 8-virtual-CPU-device mesh (no TPU pod exists in this
environment), so ABSOLUTE times are CPU times; the load-bearing numbers
are the intra-process RATIOS (halo vs GSPMD on identical hardware, and
sharded vs full-domain pack inside the same shard_map setup) and the
compiled-HLO collective counts.

Usage: python scripts/diag_mesh_work.py [grid=64] [steps=3]
"""

import functools
import re
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.parallel import halo_step as hs
from fluidsimulation_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_step,
    shard_state,
)
from fluidsimulation_tpu.core.interp_packed import pack_mac3

try:
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.sharding import PartitionSpec as P
    from jax.shard_map import shard_map


def timeit(fn, reps):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def collective_counts(lowered_text):
    counts = {}
    for name in ("collective-permute", "all-gather", "all-reduce", "all-to-all"):
        counts[name] = len(re.findall(rf"{name}-start|{name}\.", lowered_text)) or len(
            re.findall(name, lowered_text)
        )
    return counts


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    devs = jax.devices()
    assert len(devs) >= 8, "need xla_force_host_platform_device_count=8"
    mesh = make_mesh(devs[:8])
    cfg = SimConfig(nx=n, ny=n, nz=n, cells_per_meter=float(n))
    print(f"grid {n}^3, shard {n // 8}x{n}x{n}, particles ~{(n // 2) ** 3 * 8}")

    # -- whole-step wall clock -------------------------------------------
    st_h = hs.shard_state_x(init_state(cfg), mesh)
    halo = hs.make_halo_step(cfg, mesh)
    t_h, st_h = timeit(lambda: halo(st_h, 0.01), steps)
    print(f"halo step   : {t_h * 1e3:8.1f} ms/step (CPU mesh)")

    st_g = shard_state(init_state(cfg), mesh)
    gspmd = make_sharded_step(cfg, mesh)
    t_g, st_g = timeit(lambda: gspmd(st_g, 0.01), steps)
    print(f"GSPMD step  : {t_g * 1e3:8.1f} ms/step (CPU mesh)")
    print(f"halo/GSPMD ratio: {t_h / t_g:.3f}")

    # -- compiled collective counts at this grid -------------------------
    txt_h = jax.jit(halo).lower(st_h, 0.01).compile().as_text()
    txt_g = jax.jit(gspmd).lower(st_g, 0.01).compile().as_text()
    for label, txt in (("halo", txt_h), ("GSPMD", txt_g)):
        c = {
            k: len(re.findall(rf"\b{k}", txt))
            for k in ("collective-permute", "all-gather", "all-reduce", "all-to-all")
        }
        print(f"{label:6s} collectives: {c}")

    # -- per-shard pack work: sharded 1/D vs full-domain-per-shard -------
    uf = jnp.asarray(np.random.default_rng(0).normal(size=(n + 1, n, n)), jnp.float32)
    vf = jnp.asarray(np.random.default_rng(1).normal(size=(n, n + 1, n)), jnp.float32)
    wf = jnp.asarray(np.random.default_rng(2).normal(size=(n, n, n + 1)), jnp.float32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    def pack_sharded(u, v, w):
        me = jax.lax.axis_index(hs.AXIS)
        return hs._pack_mac3_sharded(u, v, w, (n, n, n), me, 8)[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    def pack_full(u, v, w):
        return pack_mac3(u, v, w)[0]

    t_s, _ = timeit(lambda: pack_sharded(uf, vf, wf), max(steps, 4))
    t_f, _ = timeit(lambda: pack_full(uf, vf, wf), max(steps, 4))
    print(
        f"pack per shard: sharded 1/D {t_s * 1e3:7.1f} ms  vs  "
        f"full-domain {t_f * 1e3:7.1f} ms  (ratio {t_f / t_s:.2f}x)"
    )


if __name__ == "__main__":
    main()
