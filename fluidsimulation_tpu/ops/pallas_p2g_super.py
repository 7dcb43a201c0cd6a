"""Pallas TPU kernel: P2G transfer over VMEM-resident SUPERCELL-table tiles.

Same role as ops/pallas_p2g.py but for the (2,2,1) supercell table
(ops/supertable.py): tiles the pre-padded (sx+2, sy+2, Ks, sz+2) fields with
overlapping ``pl.Element`` halo blocks, and accumulates the reference's
{-1,0} x {-1,0,1}^2 cell windows (gpTransferParticleVelocitiesU.hlsl:36-59)
for all three components and all four (x, y) cell parities from VMEM.

Window bookkeeping (see supertable.p2g_from_super): per parity the pooled
x/y axes need only 2 supercell offsets, z keeps exact cell offsets, and
membership masks (on floor(p+0.5) of the stored position) restrict slots to
exactly the reference window — per output cell that is 2*2*3 supercells *
Ks = 96 slot visits vs the per-cell kernel's 27 * K.

Outputs are parity-packed cell-indexed accumulators (4, sx, sy, nz)
(acc[a][c] = unnormalized face value at staggered index c+1, amt = weight
sum); the cheap parity interleave, normalization, boundary faces, validity,
and overflow correction stay in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig
from .supertable import F


def p2g_accumulate_pallas_super(cfg: SimConfig, slots, tx: int = 1, ty: int = 8):
    """slots: (sx, sy, Ks, 8, sz) supercell table.  Returns (accs, amts):
    two lists of three (nx, ny, nz) cell-indexed accumulator grids.

    ty must be 8 (output block sublane constraint); tx=1 keeps the 7 halo
    input blocks + in-kernel temps within the ~16 MB VMEM budget at Ks=8,
    nz=128."""
    assert F == (2, 2, 1)
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy = nx // 2, ny // 2
    Ks = slots.shape[2]
    assert sx % tx == 0 and sy % ty == 0

    fields = [
        jnp.pad(slots[:, :, :, i, :], ((1, 1), (1, 1), (0, 0), (1, 1)))
        for i in range(7)
    ]  # each (sx+2, sy+2, Ks, nz+2)

    def kernel(*refs):
        ins = refs[:7]
        outs = refs[7:13]
        i = pl.program_id(0)
        j = pl.program_id(1)
        sx0 = jnp.asarray(i * tx, jnp.float32)
        sy0 = jnp.asarray(j * ty, jnp.float32)

        px, py, pz, vx, vy, vz, pres = [r[:] for r in ins]
        vel3 = (vx, vy, vz)

        # Supercell coordinates of the output tile (cell coords are
        # 2*super + parity), broadcast over (tx, ty, 1, nz).
        gx = sx0 + jax.lax.broadcasted_iota(
            jnp.int32, (tx, ty, 1, nz), 0
        ).astype(jnp.float32)
        gy = sy0 + jax.lax.broadcasted_iota(
            jnp.int32, (tx, ty, 1, nz), 1
        ).astype(jnp.float32)
        fz = jax.lax.broadcasted_iota(
            jnp.int32, (tx, ty, 1, nz), 3
        ).astype(jnp.float32)

        for parx in range(2):
            for pary in range(2):
                p = parx * 2 + pary
                fx = 2.0 * gx + parx
                fy = 2.0 * gy + pary
                acc = [jnp.zeros((tx, ty, nz), jnp.float32) for _ in range(3)]
                amt = [jnp.zeros((tx, ty, nz), jnp.float32) for _ in range(3)]
                # x/y supercell offsets covering cells f-1..f+1:
                # parity 0 -> {-1, 0}, parity 1 -> {0, +1}.
                for ox in ((-1, 0) if parx == 0 else (0, 1)):
                    for oy in ((-1, 0) if pary == 0 else (0, 1)):
                        for dz in (-1, 0, 1):
                            sl = (
                                slice(1 + ox, 1 + ox + tx),
                                slice(1 + oy, 1 + oy + ty),
                                slice(None),
                                slice(1 + dz, 1 + dz + nz),
                            )
                            rels = (px[sl] - fx, py[sl] - fy, pz[sl] - fz)
                            wn = [
                                jnp.maximum(0.0, 1.0 - jnp.abs(r))
                                for r in rels
                            ]
                            ws = [
                                jnp.maximum(0.0, 1.0 - jnp.abs(r - 0.5))
                                for r in rels
                            ]
                            # Membership: the contributing CELL of each slot
                            # relative to the output cell, along pooled axes.
                            dcx = jnp.floor(px[sl] + 0.5) - fx
                            dcy = jnp.floor(py[sl] + 0.5) - fy
                            mx_n = (dcx >= -1.0) & (dcx <= 1.0)
                            mx_s = (dcx >= 0.0) & (dcx <= 1.0)
                            my_n = (dcy >= -1.0) & (dcy <= 1.0)
                            my_s = (dcy >= 0.0) & (dcy <= 1.0)
                            base = pres[sl]
                            for a in range(3):
                                if a == 2 and dz not in (0, 1):
                                    continue
                                wgt = base
                                for ax in range(3):
                                    wgt = wgt * (ws[ax] if ax == a else wn[ax])
                                wgt = wgt * (mx_s if a == 0 else mx_n)
                                wgt = wgt * (my_s if a == 1 else my_n)
                                acc[a] = acc[a] + (wgt * vel3[a][sl]).sum(2)
                                amt[a] = amt[a] + wgt.sum(2)
                for a in range(3):
                    outs[2 * a][p] = acc[a]
                    outs[2 * a + 1][p] = amt[a]

    in_spec = pl.BlockSpec(
        (pl.Element(tx + 2), pl.Element(ty + 2), pl.Element(Ks), pl.Element(nz + 2)),
        lambda i, j: (i * tx, j * ty, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (4, tx, ty, nz), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(sx // tx, sy // ty),
        out_shape=tuple(
            jax.ShapeDtypeStruct((4, sx, sy, nz), jnp.float32)
            for _ in range(6)
        ),
        in_specs=[in_spec] * 7,
        out_specs=(out_spec,) * 6,
        interpret=jax.default_backend() != "tpu",
    )(*fields)

    def interleave(a):
        # (4, sx, sy, nz) parity-packed -> (nx, ny, nz).
        a = a.reshape(2, 2, sx, sy, nz)
        return a.transpose(2, 0, 3, 1, 4).reshape(nx, ny, nz)

    accs = [interleave(outs[2 * a]) for a in range(3)]
    amts = [interleave(outs[2 * a + 1]) for a in range(3)]
    return accs, amts


def p2g_from_super_pallas(cfg: SimConfig, table, pos=None, vel=None):
    """Full supercell P2G using the Pallas accumulator kernel;
    normalization, boundary handling, and overflow correction identical to
    supertable.p2g_from_super."""
    from . import celltable as ct

    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    pc = pos * jnp.array([nx, ny, nz], jnp.float32) if pos is not None else None
    accs, amts = p2g_accumulate_pallas_super(cfg, table.slots)
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
