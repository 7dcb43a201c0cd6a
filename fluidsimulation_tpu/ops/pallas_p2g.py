"""Pallas TPU kernel: P2G transfer over VMEM-resident cell-table tiles.

STATUS: semantics verified (interpret-mode test matches the XLA path to
3e-8), but NOT wired into the default step — on this environment's tunneled
TPU runtime, *any* kernel using manual `make_async_copy` from an ANY-space
input with dynamic slices crashes the TPU worker (reproduced with a minimal
halo-DMA kernel; likely a libtpu/tunnel issue, see CLAUDE.md).  Re-evaluate
on a direct-attached TPU runtime; projected win is ~5x on the P2G stage.

The XLA formulation (ops/celltable.p2g_from_table) streams the dense cell
table from HBM once per neighborhood offset; measured effective bandwidth is
poor (~130 GB/s) because the (x, y)-shifted windows defeat fusion.  This
kernel tiles the (padded) table over (x, y), DMAs each halo tile into VMEM
once, and accumulates all 27 offsets x 3 components locally — table traffic
drops to ~1 read of each field (plus halo overlap).

Inputs are the table's fields pre-split into 7 arrays (px, py, pz, vx, vy,
vz, present), each zero-padded to (nx+2, ny+2, K, nz+2).  Outputs are
*cell-indexed* accumulators (see p2g_from_table_fused): acc[a][c] is the
unnormalized face value at staggered index c+1 of component a, amt[a][c] the
weight sum.  Normalization, boundary faces, validity, and the overflow
correction stay in XLA (cheap).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig


def p2g_accumulate_pallas(cfg: SimConfig, slots, tx: int = 4, ty: int = 8):
    # ty must be a multiple of 8 (output block sublane constraint).
    """slots: (nx, ny, K, 8, nz) table.  Returns (accs, amts): two lists of
    three (nx, ny, nz) cell-indexed accumulator grids."""
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    K = slots.shape[2]
    assert nx % tx == 0 and ny % ty == 0

    # Pre-split and pad fields (dense, cheap).  The minor dim is padded up
    # to a multiple of 128 lanes: DMA slices must be lane-aligned.
    zpad = -(-(nz + 2) // 128) * 128
    fields = [slots[:, :, :, i, :] for i in range(7)]
    fields = [
        jnp.pad(f, ((1, 1), (1, 1), (0, 0), (1, zpad - nz - 1)))
        for f in fields
    ]  # (nx+2, ny+2, K, zpad)

    def kernel(*refs):
        # refs: 7 inputs (HBM) + 6 outputs (VMEM blocks) + scratch (7 VMEM
        # tiles + 7 DMA semaphores)
        ins = refs[:7]
        outs = refs[7:13]
        tiles = refs[13:20]
        sems = refs[20]

        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = pl.multiple_of(i * tx, tx)
        y0 = pl.multiple_of(j * ty, ty)

        # DMA the halo tile of each field into VMEM.
        for f in range(7):
            pltpu.make_async_copy(
                ins[f].at[pl.ds(x0, tx + 2), pl.ds(y0, ty + 2)],
                tiles[f],
                sems.at[f],
            ).start()
        for f in range(7):
            pltpu.make_async_copy(
                ins[f].at[pl.ds(x0, tx + 2), pl.ds(y0, ty + 2)],
                tiles[f],
                sems.at[f],
            ).wait()

        px, py, pz, vx, vy, vz, pres = [t[:] for t in tiles]

        # Cell coordinates of the OUTPUT tile (absolute), broadcast over
        # (tx, ty, K, nz).
        # Mosaic iota must be integer-typed; convert after.
        fx = jnp.asarray(x0, jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (tx, ty, 1, nz), 0
        ).astype(jnp.float32)
        fy = jnp.asarray(y0, jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (tx, ty, 1, nz), 1
        ).astype(jnp.float32)
        fz = jax.lax.broadcasted_iota(jnp.int32, (tx, ty, 1, nz), 3).astype(
            jnp.float32
        )

        for a in range(3):
            outs[2 * a][:] = jnp.zeros((tx, ty, nz), jnp.float32)
            outs[2 * a + 1][:] = jnp.zeros((tx, ty, nz), jnp.float32)

        vel3 = (vx, vy, vz)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    # Window of the halo tile aligned with the output tile,
                    # shifted by (dx, dy, dz); the padded input absorbs the
                    # z shift (nz+2 minor lanes).
                    sl = (
                        slice(1 + dx, 1 + dx + tx),
                        slice(1 + dy, 1 + dy + ty),
                        slice(None),
                        slice(1 + dz, 1 + dz + nz),
                    )
                    wpx = px[sl]
                    wpy = py[sl]
                    wpz = pz[sl]
                    wpres = pres[sl]
                    # Hat weights vs normal (cell) and staggered (cell+0.5)
                    # face coordinates; positions are absolute cell units.
                    rels = (wpx - fx, wpy - fy, wpz - fz)
                    wn = [jnp.maximum(0.0, 1.0 - jnp.abs(r)) for r in rels]
                    ws = [
                        jnp.maximum(0.0, 1.0 - jnp.abs(r - 0.5)) for r in rels
                    ]
                    d = (dx, dy, dz)
                    for a in range(3):
                        if d[a] not in (0, 1):
                            continue
                        wgt = wpres
                        for ax in range(3):
                            wgt = wgt * (ws[ax] if ax == a else wn[ax])
                        velc = vel3[a][sl]
                        outs[2 * a][:] = outs[2 * a][:] + (wgt * velc).sum(2)
                        outs[2 * a + 1][:] = outs[2 * a + 1][:] + wgt.sum(2)

    grid = (nx // tx, ny // ty)
    out_shape = []
    out_specs = []
    for _ in range(6):
        out_shape.append(jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (tx, ty, nz),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            )
        )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 7,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((tx + 2, ty + 2, K, zpad), jnp.float32)
            for _ in range(7)
        ]
        + [pltpu.SemaphoreType.DMA((7,))],
        interpret=jax.default_backend() != "tpu",
    )(*fields)
    accs = [outs[0], outs[2], outs[4]]
    amts = [outs[1], outs[3], outs[5]]
    return accs, amts


def p2g_from_table_pallas(cfg: SimConfig, table, pos=None, vel=None):
    """Full P2G using the Pallas accumulator kernel; normalization, boundary
    handling, and overflow correction identical to p2g_from_table_fused."""
    from . import celltable as ct

    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    accs, amts = p2g_accumulate_pallas(cfg, table.slots)
    out = []
    for a, shape in ((0, (nx + 1, ny, nz)), (1, (nx, ny + 1, nz)), (2, (nx, ny, nz + 1))):
        pad = [(0, 0)] * 3
        pad[a] = (1, 0)
        acc = jnp.pad(accs[a], pad)
        amt = jnp.pad(amts[a], pad)
        if pos is not None:
            acc, amt = ct._overflow_scatter(cfg, table, pos, vel, a, shape, acc, amt)
        g = acc / jnp.maximum(amt, jnp.float32(1e-30))
        valid = amt > cfg.zero_thresh
        for edge in (0, (nx, ny, nz)[a]):
            sl = [slice(None)] * 3
            sl[a] = edge
            g = g.at[tuple(sl)].set(0.0)
            valid = valid.at[tuple(sl)].set(True)
        out.append((g, valid))
    (u, uv), (v, vv), (w, wv) = out
    return u, v, w, uv, vv, wv
