"""Pallas TPU kernel: build the combined-key interpolation table on-chip.

core/interp_combined.py's single-gather-per-query design was measured round
2 to lose end-to-end because its pack — a 51-slice interleave onto the minor
axis — runs at ~18 GB/s under XLA (28 ms per pack at 128^3; see the module
docstring there).  This kernel does the interleave in VMEM: each program
loads thin windows of the three MAC grids, stacks the 51 shifted z-slices on
a SUBLANE axis (cheap: z stays the lane axis), transposes the (64, nzk) tile
once in VMEM, and writes the (Y*nzk, 64) row block.

The (dy, dz) halo shifts are materialized as 19 shifted input copies (one
per U/V/W y,z-offset pair) rather than sliced in-kernel: Mosaic requires the
last-two block dims be 8/128-aligned or full (so no overlapping y-windows),
and rejects concatenating vectors with mismatched lane offsets (so no
in-kernel z-shifts).  The extra ~160 MB of HBM traffic for the copies is
~0.4 ms at v5e bandwidth — noise next to the 28 ms XLA interleave this
replaces.  Only the x-shift stays an in-kernel (sublane-dim) index.

Column order and padding semantics match pack_mac3_combined exactly
(tests enforce bit equality), so interp_mac3_combined consumes the result
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_mac3_combined_pallas(u, v, w, y_tile: int = 8):
    """u: (nx+1, ny, nz); v: (nx, ny+1, nz); w: (nx, ny, nz+1).
    Returns tab: (nx*ny*(nz-1), 64) f32 == pack_mac3_combined(u, v, w)."""
    nx = u.shape[0] - 1
    ny = v.shape[1] - 1
    nz = w.shape[2] - 1
    nzk = nz - 1
    Y = min(y_tile, ny)
    assert ny % Y == 0 and Y % 8 == 0

    up = jnp.pad(u, ((0, 0), (1, 1), (0, 0)))  # (nx+1, ny+2, nz)
    vp = jnp.pad(v, ((1, 1), (0, 0), (0, 0)))  # (nx+2, ny+1, nz)
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0)))  # (nx+2, ny+2, nz+1)

    # (dy, dz)-shifted copies; kernel blocks then need no overlapping or
    # lane-offset slicing (see module docstring).
    ushift = [up[:, dy : dy + ny, dz : dz + nzk] for dy in range(3) for dz in range(2)]
    vshift = [vp[:, dy : dy + ny, dz : dz + nzk] for dy in range(2) for dz in range(2)]
    wshift = [wp[:, dy : dy + ny, dz : dz + nzk] for dy in range(3) for dz in range(3)]

    def kernel(*refs):
        urefs = refs[0:6]
        vrefs = refs[6:10]
        wrefs = refs[10:19]
        out_ref = refs[19]
        cols = []
        for dx in range(2):
            for s in range(6):
                cols.append(urefs[s][dx])
        for dx in range(3):
            for s in range(4):
                cols.append(vrefs[s][dx])
        for dx in range(3):
            for s in range(9):
                cols.append(wrefs[s][dx])
        cols += [jnp.zeros((Y, nzk), jnp.float32)] * 13
        stacked = jnp.stack(cols, axis=1)  # (Y, 64, nzk) — z stays lanes
        out_ref[:] = stacked.transpose(0, 2, 1).reshape(Y * nzk, 64)

    grid = (nx, ny // Y)

    def spec(xb):
        return pl.BlockSpec(
            (pl.Element(xb), pl.Element(Y), pl.Element(nzk)),
            lambda i, j: (i, j * Y, 0),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (Y * nzk, 64),
        lambda i, j: (i * (ny // Y) + j, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((nx * ny * nzk, 64), jnp.float32),
        in_specs=[spec(2)] * 6 + [spec(3)] * 13,
        out_specs=out_spec,
        interpret=jax.default_backend() != "tpu",
    )(*ushift, *vshift, *wshift)
