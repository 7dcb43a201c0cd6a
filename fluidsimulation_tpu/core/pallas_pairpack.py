"""Pallas TPU kernel: build the FLIP fat pair tables on-chip.

flip_update_carry packs [diff|new] fat 1 KB rows (pack_mac3_pair) every
step; the XLA pack measured ~21 ms at 128^3 and is fixed-cost dominated
(packing six grids costs the same as three — docs/PERF.md).  This kernel
assembles the rows in VMEM instead: each program loads thin pre-shifted
windows of the six MAC grids and emits one (Y*ns, 256)-row block of the
fat table with a single in-VMEM stack + reshape (the working pattern from
core/pallas_pack.py).

Layout notes (vs interp_packed.pack_mac3_pair):

* U is emitted with a PADDED row-key stride: ``key = (iEI*ny + iJ)*ns +
  seg`` (stride ny instead of ny-1), because Mosaic output blocks must
  tile the row axis exactly and ``(ny-1)*ns`` rows per x-slab is not
  8-aligned.  The iJ = ny-1 rows are dead (never addressed: iJ <= ny-2).
  Consumers infer the stride from the table's ROW COUNT (nx*ny*ns vs
  nx*(ny-1)*ns — see interp_packed._u_stride), so plain XLA packs, the
  sharded multi-chip pack (unchanged U row count), and this kernel's
  tables all interpolate through the same functions.
* V/W row layouts are unchanged (their key strides are already aligned).
* Row content is bit-identical to pack_mac3_pair's: 8 corner segments of
  32 z-lanes, [A00 A01 A10 A11 B00 B01 B10 B11], pure data movement.

The (dy, seg) window shifts are materialized as pre-sliced input copies
(Mosaic rejects lane-offset slicing, and the last-two block dims must be
%8/%128 or full — same constraints as core/pallas_pack.py); only the
2-wide x halo window stays an in-kernel outer-dim index via pl.Element
blocks on the self-padded inputs (the ops/pallas_p2g.py pattern).

Reference anchor: gpUpdateParticleVelocities.hlsl + gpAdvect.hlsl (the
stages the pack feeds); the pack itself has no reference counterpart (it
exists because XLA gathers are transaction-bound, CLAUDE.md cost model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp_packed import _L, _S, _nseg, _pad_minor


def _zwin_copies(a, ns: int):
    """Pre-sliced 32-lane z-window copies [a[..., 31s : 31s+32)]."""
    ap = _pad_minor(a, _S * (ns - 1) + _L)
    return [ap[..., _S * s : _S * s + _L] for s in range(ns)]


def _pair_pack_component(ga, gb, n_major: int, n_mid: int, ns: int,
                         mid_tile: int):
    """Shared kernel driver: emit (n_major * n_mid * ns, 8*_L) rows where
    row (m, j, s) holds corners g[m + dx, j + dy, 31s : 31s+32] for
    (set, dx, dy) in [A00 A01 A10 A11 B00 B01 B10 B11].

    ``ga``/``gb`` must carry extents (>= n_major+1, >= n_mid+1, z); the
    mid axis is tiled by ``mid_tile`` (%8, divides n_mid)."""
    T = mid_tile
    assert n_mid % T == 0 and T % 8 == 0

    ins = []
    for g in (ga, gb):
        for dy in range(2):
            sl = g[:, dy : dy + n_mid, :]
            ins.extend(_zwin_copies(sl, ns))

    def kernel(*refs):
        out_ref = refs[-1]
        # Fat rows assemble by LANE-dim concatenation of the eight 32-lane
        # corner segments (all operands at lane offset 0 — Mosaic accepts
        # this; only mismatched offsets on non-concat dims are rejected).
        # The (T, ns, 8*_L) -> (T*ns, 8*_L) reshape collapses OUTER dims
        # with the lane dim fixed, the supported pallas_pack.py pattern;
        # the previous (T, ns*8, _L) -> (T*ns, 8*_L) lane-widening reshape
        # was an unsupported shape cast on the real backend.
        rows = []
        for s in range(ns):
            segs = [
                refs[(st * 2 + dy) * ns + s][dx]
                for st in range(2)
                for dx in range(2)
                for dy in range(2)
            ]
            rows.append(jnp.concatenate(segs, axis=-1))  # (T, 8*_L)
        stacked = jnp.stack(rows, axis=1)  # (T, ns, 8*_L)
        out_ref[:] = stacked.reshape(T * ns, 8 * _L)

    grid = (n_major, n_mid // T)
    in_spec = pl.BlockSpec(
        (pl.Element(2), pl.Element(T), pl.Element(_L)),
        lambda i, j: (i, j * T, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (T * ns, 8 * _L),
        lambda i, j: (i * (n_mid // T) + j, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n_major * n_mid * ns, 8 * _L),
                                       jnp.float32),
        in_specs=[in_spec] * (4 * ns),
        out_specs=out_spec,
        interpret=jax.default_backend() != "tpu",
    )(*ins)


def _mid_tile(n_mid: int, cap: int = 64) -> int:
    t = 8
    for c in (64, 56, 48, 40, 32, 24, 16, 8):
        if c <= cap and n_mid % c == 0:
            t = c
            break
    return t


def pairpack_fits(dims) -> bool:
    """Alignment guard for the Pallas pair pack (else use the XLA pack)."""
    nx, ny, nz = dims
    return ny % 8 == 0 and nz % 8 == 0 and min(nx, ny, nz) >= 8


def pack_mac3_pair_pallas(macA, macB):
    """Pallas twin of interp_packed.pack_mac3_pair, U rows in the padded
    stride-ny layout (see module docstring).  Returns (pu2, pv2, pw2)."""
    uA, vA, wA = macA
    uB, vB, wB = macB
    nx = uA.shape[0] - 1
    ny = vA.shape[1] - 1
    nz = wA.shape[2] - 1
    ns = _nseg(nz)
    nsx = _nseg(nx)

    # U: majors iEI in [0,nx-1] (extent nx+1 ok), mid iJ in [0,ny-1]
    # padded (y-extend by one zero row so dy=1 reads exist).
    uAp = jnp.pad(uA, ((0, 0), (0, 1), (0, 0)))
    uBp = jnp.pad(uB, ((0, 0), (0, 1), (0, 0)))
    pu = _pair_pack_component(uAp, uBp, nx, ny, ns, _mid_tile(ny))

    # V: majors iI in [0,nx-2], mid iEJ in [0,ny-1] (extent ny+1 ok).
    pv = _pair_pack_component(vA, vB, nx - 1, ny, ns, _mid_tile(ny))

    # W: packed transposed (y, z, x) with x lanes; majors iJ in [0,ny-2],
    # mid iEK in [0,nz-1] (extent nz+1 ok).
    wAt = jnp.transpose(wA, (1, 2, 0))
    wBt = jnp.transpose(wB, (1, 2, 0))
    pw = _pair_pack_component(wAt, wBt, ny - 1, nz, nsx, _mid_tile(nz))
    return pu, pv, pw


def pack_mac3_pair_padded(macA, macB):
    """XLA twin of pack_mac3_pair_pallas (same padded-U layout) — the
    bit-equality oracle for the kernel and a CPU-path fallback."""
    from .interp_packed import _segments

    uA, vA, wA = macA
    uB, vB, wB = macB
    nx = uA.shape[0] - 1
    ny = vA.shape[1] - 1
    nz = wA.shape[2] - 1

    def corners(sa, sb, x0, x1, y0, y1):
        return [
            sa[x0, y0], sa[x0, y1], sa[x1, y0], sa[x1, y1],
            sb[x0, y0], sb[x0, y1], sb[x1, y0], sb[x1, y1],
        ]

    sa = _segments(jnp.pad(uA, ((0, 0), (0, 1), (0, 0))))
    sb = _segments(jnp.pad(uB, ((0, 0), (0, 1), (0, 0))))
    pu = jnp.stack(
        corners(sa, sb, slice(0, nx), slice(1, nx + 1),
                slice(0, ny), slice(1, ny + 1)),
        axis=3,
    ).reshape(nx * ny * _nseg(nz), 8 * _L)

    sa, sb = _segments(vA), _segments(vB)
    pv = jnp.stack(
        corners(sa, sb, slice(0, nx - 1), slice(1, nx),
                slice(0, ny), slice(1, ny + 1)),
        axis=3,
    ).reshape((nx - 1) * ny * _nseg(nz), 8 * _L)

    sa = _segments(jnp.transpose(wA, (1, 2, 0)))
    sb = _segments(jnp.transpose(wB, (1, 2, 0)))
    pw = jnp.stack(
        corners(sa, sb, slice(0, ny - 1), slice(1, ny),
                slice(0, nz), slice(1, nz + 1)),
        axis=3,
    ).reshape((ny - 1) * nz * _nseg(nx), 8 * _L)
    return pu, pv, pw
