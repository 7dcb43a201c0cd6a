"""Isolate what binds the super-P2G kernel's ~36-41 ms at 128^3.

Arithmetic says it should be far cheaper: total input DMA with the x3/y1.25
halo re-read is ~4.5 GB-at-most ~5-6 ms at HBM rate, and the window-term
VPU work is <1 ms.  Hypotheses: (a) the pl.Element halo DMA with a
130-lane (non-128-aligned) minor dim degrades to element/strided copies;
(b) per-program overhead at 512 tiny programs; (c) in-kernel relayouts.

Probe kernels with the SAME grid/BlockSpecs but trivial compute:
  null-elem : 7 Element-halo inputs (exact super-P2G specs), output = a
              slice of one field (measures DMA + pipeline only)
  null-plain: 7 plain non-overlapping inputs (tx, ty, Ks, 130 full lane
              dim), same outputs (measures aligned-block DMA)
  real      : the actual p2g_accumulate_pallas_super for reference

Usage (TPU): python scripts/diag_p2g_dma.py [grid]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.supertable import build_super_table
from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_accumulate_pallas_super


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, f, *args, n=5):
    out = f(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)


def null_elem(cfg, slots, tx=1, ty=8):
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy = nx // 2, ny // 2
    Ks = slots.shape[2]
    fields = [
        jnp.pad(slots[:, :, :, i, :], ((1, 1), (1, 1), (0, 0), (1, 1)))
        for i in range(7)
    ]

    def kernel(*refs):
        ins = refs[:7]
        out = refs[7]
        acc = jnp.zeros((4, tx, ty, nz), jnp.float32)
        for r in ins:
            # touch one sublane of the block; no relayout (outer-dim slice)
            acc = acc + r[1 : 1 + tx, 1 : 1 + ty, 0, 1 : 1 + nz][None]
        out[:] = acc

    in_spec = pl.BlockSpec(
        (pl.Element(tx + 2), pl.Element(ty + 2), pl.Element(Ks), pl.Element(nz + 2)),
        lambda i, j: (i * tx, j * ty, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (4, tx, ty, nz), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(sx // tx, sy // ty),
        out_shape=jax.ShapeDtypeStruct((4, sx, sy, nz), jnp.float32),
        in_specs=[in_spec] * 7,
        out_specs=out_spec,
        interpret=jax.default_backend() != "tpu",
    )(*fields)


def null_plain(cfg, slots, tx=1, ty=8):
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy = nx // 2, ny // 2
    Ks = slots.shape[2]
    fields = [
        jnp.pad(slots[:, :, :, i, :], ((0, 0), (0, 0), (0, 0), (1, 1)))
        for i in range(7)
    ]  # (sx, sy, Ks, nz+2) — no x/y halo, full 130-lane minor dim

    def kernel(*refs):
        ins = refs[:7]
        out = refs[7]
        acc = jnp.zeros((4, tx, ty, nz), jnp.float32)
        for r in ins:
            acc = acc + r[:, :, 0, 1 : 1 + nz][None]
        out[:] = acc

    in_spec = pl.BlockSpec(
        (tx, ty, Ks, nz + 2),
        lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (4, tx, ty, nz), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(sx // tx, sy // ty),
        out_shape=jax.ShapeDtypeStruct((4, sx, sy, nz), jnp.float32),
        in_specs=[in_spec] * 7,
        out_specs=out_spec,
        interpret=jax.default_backend() != "tpu",
    )(*fields)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    table = jax.jit(lambda p, v: build_super_table(cfg, p, v))(s.pos, s.vel)
    fetch(table.slots)
    print("backend", jax.default_backend(), "grid", grid, flush=True)

    timeit("null-elem (7 Element-halo inputs, no compute)",
           jax.jit(lambda t: null_elem(cfg, t.slots)), table)
    timeit("null-plain (7 aligned plain inputs)",
           jax.jit(lambda t: null_plain(cfg, t.slots)), table)
    timeit("real p2g_accumulate_pallas_super",
           jax.jit(lambda t: p2g_accumulate_pallas_super(cfg, t.slots)), table)


if __name__ == "__main__" and not (len(sys.argv) > 1 and sys.argv[1] == "ab"):
    main()
    sys.exit(0)


def ab_preshift():
    """A/B the preshift fix on the real backend + step-level impact."""
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    table = jax.jit(lambda p, v: build_super_table(cfg, p, v))(s.pos, s.vel)
    fetch(table.slots)
    print("backend", jax.default_backend(), "grid", grid, flush=True)

    kernel_only = len(sys.argv) > 3 and sys.argv[3] == "kernel"
    f_new = jax.jit(lambda t: p2g_accumulate_pallas_super(
        cfg, t.slots, preshift=True, batched=False))
    print("compiling unbatched...", flush=True)
    a1, m1 = f_new(table)
    fetch(a1[0])
    timeit("super-P2G preshift (unbatched)", f_new, table)
    for ch in (16, 8, 4):
        f_bat = jax.jit(functools.partial(
            lambda t, c: p2g_accumulate_pallas_super(
                cfg, t.slots, preshift=True, batched=True, combo_chunk=c),
            c=ch))
        print(f"compiling batched chunk={ch}...", flush=True)
        try:
            a2, m2 = f_bat(table)
            worst2 = max(
                float(jnp.max(jnp.abs(x - y)))
                for x, y in zip(a1 + m1, a2 + m2)
            )
            print(f"max |unbatched-batched c{ch}|: {worst2:.3e}", flush=True)
            timeit(f"super-P2G batched chunk={ch}", f_bat, table)
        except Exception as e:  # Mosaic VMEM / compile-helper failures
            print(f"batched chunk={ch} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    if kernel_only:
        return

    # Step-level A/B: fresh jit per form (the env toggle resolves at trace
    # time), warm state so both time the identical workload.
    import os
    import time as _t

    from fluidsimulation_tpu.solver.step3d import step

    dt = 1.0 / 60.0
    forms = {}
    for name, flag in (("unbatched", "0"), ("batched c16", "1"),
                       ("batched c8", "8")):
        os.environ["FST_P2G_BATCHED"] = flag
        f = jax.jit(lambda st, d: step(st, d, cfg, fast=True))
        try:
            s2 = f(s, dt)
            fetch(s2)
            forms[name] = (f, s2)
        except Exception as e:
            print(f"step form {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    for name, (f, s2) in forms.items():
        best = float("inf")
        for _ in range(2):
            t0 = _t.perf_counter()
            ss = s2
            for _ in range(10):
                ss = f(ss, dt)
            fetch(ss)
            best = min(best, (_t.perf_counter() - t0) / 10)
        print(f"fused step ({name}):  {best*1e3:9.2f} ms", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "ab":
    ab_preshift()
    sys.exit(0)
