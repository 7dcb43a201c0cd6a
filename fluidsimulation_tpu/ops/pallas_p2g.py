"""Pallas TPU kernel: P2G transfer over VMEM-resident cell-table tiles.

The XLA formulation (ops/celltable.p2g_from_table) streams the dense cell
table from HBM once per neighborhood offset; measured effective bandwidth is
poor because the (x, y)-shifted windows defeat fusion.  This kernel tiles
the (pre-padded) table over (x, y) with *overlapping halo blocks* —
``pl.Element``-indexed BlockSpecs, auto-pipelined by Pallas — and
accumulates all 27 offsets x 3 components from VMEM.  Each table field is
read ~once (plus halo overlap) instead of ~27 times.

(A first version used manual `make_async_copy` halo DMA; that pattern
crashes this environment's tunneled TPU runtime — see CLAUDE.md.  The
Element-indexed formulation compiles and runs natively.)

Inputs are the table's fields pre-split into 7 arrays (px, py, pz, vx, vy,
vz, present), zero-padded to (nx+2, ny+2, K, nz+2).  Outputs are
*cell-indexed* accumulators (see celltable.p2g_from_table_fused): acc[a][c]
is the unnormalized face value at staggered index c+1 of component a,
amt[a][c] the weight sum.  Normalization, boundary faces, validity, and the
overflow correction stay in XLA (cheap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig


def p2g_fits_vmem(cfg: SimConfig, K: int, tx: int = 4, ty: int = 8,
                  budget: int = 12 << 20) -> bool:
    """Whether the halo-tile kernel fits the ~16 MB scoped VMEM limit.

    Mosaic stack-allocates every live block (CLAUDE.md), and blocks are
    *padded* to the (8, 128) tile grid and *double-buffered* by the
    pipeline, so the estimate must use padded sizes: each of the 7 input
    blocks is (tx+2, ty+2, ceil8(K), ceil128(nz+2)) f32 x 2 buffers, plus
    the 6 output blocks (tx, ty, ceil128(nz)) x 2.  The 12 MB budget leaves
    headroom for in-kernel vector temps and classifies the measured cases
    correctly: 128^3 at K=12 (ppc_axis=2) -> 13.8 MB inputs -> UNFIT (this
    config fails the scoped-VMEM check on real TPU); 64^3 K=12 (6.9 MB) and
    128^3 K=5 (6.9 MB) -> fit (both run natively)."""
    nz = cfg.nz
    ceil8 = lambda v: -(-v // 8) * 8
    ceil128 = lambda v: -(-v // 128) * 128
    inputs = 7 * (tx + 2) * (ty + 2) * ceil8(K) * ceil128(nz + 2) * 4 * 2
    outputs = 6 * tx * ceil8(ty) * ceil128(nz) * 4 * 2
    return inputs + outputs < budget


def p2g_accumulate_pallas(cfg: SimConfig, slots, tx: int = 4, ty: int = 8):
    """slots: (nx, ny, K, 8, nz) table.  Returns (accs, amts): two lists of
    three (nx, ny, nz) cell-indexed accumulator grids.

    ty must be a multiple of 8 (output block sublane constraint); grid tiles
    are (tx, ty) over the cell grid.
    """
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    K = slots.shape[2]
    assert nx % tx == 0 and ny % ty == 0

    fields = [
        jnp.pad(slots[:, :, :, i, :], ((1, 1), (1, 1), (0, 0), (1, 1)))
        for i in range(7)
    ]  # each (nx+2, ny+2, K, nz+2)

    def kernel(*refs):
        ins = refs[:7]
        outs = refs[7:13]
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = jnp.asarray(i * tx, jnp.float32)
        y0 = jnp.asarray(j * ty, jnp.float32)

        px, py, pz, vx, vy, vz, pres = [r[:] for r in ins]

        # Absolute cell coordinates of the output tile, broadcast over
        # (tx, ty, 1, nz).
        fx = x0 + jax.lax.broadcasted_iota(jnp.int32, (tx, ty, 1, nz), 0).astype(jnp.float32)
        fy = y0 + jax.lax.broadcasted_iota(jnp.int32, (tx, ty, 1, nz), 1).astype(jnp.float32)
        fz = jax.lax.broadcasted_iota(jnp.int32, (tx, ty, 1, nz), 3).astype(jnp.float32)

        acc = [jnp.zeros((tx, ty, nz), jnp.float32) for _ in range(3)]
        amt = [jnp.zeros((tx, ty, nz), jnp.float32) for _ in range(3)]
        vel3 = (vx, vy, vz)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    sl = (
                        slice(1 + dx, 1 + dx + tx),
                        slice(1 + dy, 1 + dy + ty),
                        slice(None),
                        slice(1 + dz, 1 + dz + nz),
                    )
                    rels = (px[sl] - fx, py[sl] - fy, pz[sl] - fz)
                    wn = [jnp.maximum(0.0, 1.0 - jnp.abs(r)) for r in rels]
                    ws = [jnp.maximum(0.0, 1.0 - jnp.abs(r - 0.5)) for r in rels]
                    wpres = pres[sl]
                    d = (dx, dy, dz)
                    for a in range(3):
                        if d[a] not in (0, 1):
                            continue
                        wgt = wpres
                        for ax in range(3):
                            wgt = wgt * (ws[ax] if ax == a else wn[ax])
                        acc[a] = acc[a] + (wgt * vel3[a][sl]).sum(2)
                        amt[a] = amt[a] + wgt.sum(2)
        for a in range(3):
            outs[2 * a][:] = acc[a]
            outs[2 * a + 1][:] = amt[a]

    in_spec = pl.BlockSpec(
        (pl.Element(tx + 2), pl.Element(ty + 2), pl.Element(K), pl.Element(nz + 2)),
        lambda i, j: (i * tx, j * ty, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (tx, ty, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nx // tx, ny // ty),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32) for _ in range(6)
        ),
        in_specs=[in_spec] * 7,
        out_specs=(out_spec,) * 6,
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
    # _overflow_scatter takes positions in CELL units.
    pc = pos * jnp.array([nx, ny, nz], jnp.float32) if pos is not None else None
    accs, amts = p2g_accumulate_pallas(cfg, table.slots)
    out = []
    for a, shape in ((0, (nx + 1, ny, nz)), (1, (nx, ny + 1, nz)), (2, (nx, ny, nz + 1))):
        pad = [(0, 0)] * 3
        pad[a] = (1, 0)
        acc = jnp.pad(accs[a], pad)
        amt = jnp.pad(amts[a], pad)
        if pc is not None:
            acc, amt = ct._overflow_scatter(cfg, table, pc, vel, a, shape, acc, amt)
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
