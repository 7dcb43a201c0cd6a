"""APIC (Affine Particle-In-Cell) transfer — an extension model family.

The reference implements hybrid PIC/FLIP (gpUpdateParticleVelocities.hlsl,
Simulation.cpp:541); APIC [Jiang et al. 2015] is its canonical successor:
each particle carries an affine velocity matrix C so the transfer preserves
angular momentum exactly and is dissipation-free without FLIP's noise.
This module provides the transfer pair; `solver/apic.py` composes the full
stepper from the existing level-set / projection / advection ops.

Design notes (TPU-first, correctness tier):

* **Quadratic B-spline weights**, not the reference's linear hats: with
  linear kernels APIC's inertia matrix D_p = sum_i w_ip (x_i-x_p)(x_i-x_p)^T
  is position-dependent and singular whenever a particle aligns with a
  node; with quadratic B-splines D_p = (dx^2/4) I identically, so
  C_p = 4 B_p / dx^2 with no solve.  (This is the standard APIC choice.)
* Grids stay MAC-staggered exactly as in the rest of the framework
  (u: (nx+1,ny,nz) faces at pc-x = i-0.5; cell centers at integer pc
  coords — the convention established by ops/p2g.py's hat weights).
* C is stored per velocity component as a row of 3 derivatives:
  C[p, k, :] ~ (d v_k / d x, y, z), shape (N, 3, 3), units 1/s.
* Scatter/gather formulations mirror ops/p2g.py's `_scatter_component`
  (27 offsets instead of 8); this tier matches the CPU-twin math exactly
  and is the oracle for the packed fast paths.  Measured on TPU v5e at
  64^3 / 953k (scripts/bench_apic.py): oracle step 2053 ms; with the
  packed 9x32-row G2P (g2p_apic_packed, below) 1382 ms — the removed
  ~0.7 s matches the 81N-element-gather transaction arithmetic exactly.
  The remaining gap to the PIC/FLIP fast path's 92 ms is the P2G
  scatter's 162N elements (~1.4 s at ~9 ns/elem); its dense-window
  table form (a 16-field cell table + 36-cell spline windows, the
  celltable.p2g_from_table pattern) is the documented next lever.

Exactness property (tested): affine velocity fields v(x) = v0 + A(x-x0)
round-trip P2G -> G2P unchanged (quadratic B-splines reproduce linears),
and total momentum is conserved by P2G (sum_i w_ip (x_i-x_p) = 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SimConfig

# Validity threshold for face weights: quadratic B-spline weights are
# smaller than hats (max 0.75 per axis); faces a particle meaningfully
# touches still accumulate >> 1e-4.
APIC_WEIGHT_THRESH = 1e-4


def _quad_spline(d):
    """Quadratic B-spline value at signed distance d (support |d| < 1.5)."""
    ad = jnp.abs(d)
    inner = 0.75 - ad * ad
    outer = 0.5 * (1.5 - ad) ** 2
    return jnp.where(ad < 0.5, inner, jnp.where(ad < 1.5, outer, 0.0))


def _component_nodes(cfg: SimConfig, pc, comp_axis: int):
    """Yield (idx3, ok, w, dxm) for the 27 spline nodes of one component.

    pc: (N, 3) positions in cell units (cell centers at integers).
    idx3: list of 3 (N,) int32 node indices; ok: (N,) in-range mask;
    w: (N,) spline weight; dxm: list of 3 (N,) node-minus-particle offsets
    in METERS (x_i - x_p), the APIC lever arm.
    """
    dims = (cfg.nx, cfg.ny, cfg.nz)
    t, base = [], []
    for ax in range(3):
        ta = pc[:, ax] + (0.5 if ax == comp_axis else 0.0)
        t.append(ta)
        base.append(jnp.floor(ta - 0.5).astype(jnp.int32))
    for ox in (0, 1, 2):
        for oy in (0, 1, 2):
            for oz in (0, 1, 2):
                offs = (ox, oy, oz)
                idx = [base[ax] + offs[ax] for ax in range(3)]
                ok = jnp.ones(pc.shape[0], bool)
                w = jnp.ones(pc.shape[0], jnp.float32)
                dxm = []
                for ax in range(3):
                    hi = dims[ax] + (1 if ax == comp_axis else 0)
                    ok = ok & (idx[ax] >= 0) & (idx[ax] < hi)
                    d = t[ax] - idx[ax].astype(jnp.float32)
                    w = w * _quad_spline(d)
                    # node_pos - pc = idx - t (cell units) -> meters.
                    dxm.append(-d / jnp.float32(dims[ax]))
                yield idx, ok, w, dxm


def p2g_apic(cfg: SimConfig, pos, vel, C):
    """APIC P2G for all three MAC components.

    pos: (N,3) meters; vel: (N,3) m/s; C: (N,3,3) 1/s with C[:,k,:] the
    affine row of component k.  Returns (u, v, w, uv, vv, wv) like
    ops/p2g.py::transfer_to_grid (same boundary-face and validity
    semantics so the downstream extrapolate/project stages are reused
    unchanged).
    """
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    m = jnp.array([nx, ny, nz], jnp.float32)
    pc = pos * m

    out = []
    for comp_axis, shape in (
        (0, (nx + 1, ny, nz)),
        (1, (nx, ny + 1, nz)),
        (2, (nx, ny, nz + 1)),
    ):
        pv = vel[:, comp_axis]
        crow = C[:, comp_axis, :]
        flat_idx, flat_w, flat_val = [], [], []
        sx, sy, sz = shape
        for idx, ok, w, dxm in _component_nodes(cfg, pc, comp_axis):
            val = pv
            for ax in range(3):
                val = val + crow[:, ax] * dxm[ax]
            lin = (idx[0] * sy + idx[1]) * sz + idx[2]
            lin = jnp.where(ok, lin, 0)
            w = jnp.where(ok, w, 0.0)
            flat_idx.append(lin)
            flat_w.append(w)
            flat_val.append(w * val)
        lin = jnp.concatenate(flat_idx)
        w = jnp.concatenate(flat_w)
        vals = jnp.concatenate(flat_val)
        ncells = sx * sy * sz
        acc = jnp.zeros(ncells, jnp.float32).at[lin].add(vals).reshape(shape)
        amt = jnp.zeros(ncells, jnp.float32).at[lin].add(w).reshape(shape)
        g = acc / jnp.maximum(amt, jnp.float32(1e-30))
        valid = amt > APIC_WEIGHT_THRESH
        # Boundary faces: zero and valid (ops/p2g.py semantics).
        if comp_axis == 0:
            g = g.at[0, :, :].set(0.0).at[nx, :, :].set(0.0)
            valid = valid.at[0, :, :].set(True).at[nx, :, :].set(True)
        elif comp_axis == 1:
            g = g.at[:, 0, :].set(0.0).at[:, ny, :].set(0.0)
            valid = valid.at[:, 0, :].set(True).at[:, ny, :].set(True)
        else:
            g = g.at[:, :, 0].set(0.0).at[:, :, nz].set(0.0)
            valid = valid.at[:, :, 0].set(True).at[:, :, nz].set(True)
        out.append((g, valid))

    (u, uv), (v, vv), (w, wv) = out
    return u, v, w, uv, vv, wv


def g2p_apic(cfg: SimConfig, pos, u, v, w):
    """APIC G2P: pure-PIC velocities + affine rows from the same weights.

    Returns (vel, C): vel (N,3) m/s, C (N,3,3) 1/s with
    C[:,k,ax] = 4 * m[ax]^2 * sum_i w_ip v_i (x_i - x_p)[ax]   (= B D^-1,
    D = (1/4) diag(1/m^2) for quadratic B-splines).
    """
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    m = jnp.array([nx, ny, nz], jnp.float32)
    pc = pos * m
    n = pos.shape[0]

    vels, crows = [], []
    for comp_axis, grid in ((0, u), (1, v), (2, w)):
        gflat = grid.reshape(-1)
        shape = grid.shape
        sy, sz = shape[1], shape[2]
        dims_hi = [shape[0], shape[1], shape[2]]
        vk = jnp.zeros(n, jnp.float32)
        brow = [jnp.zeros(n, jnp.float32) for _ in range(3)]
        for idx, _ok, wgt, dxm in _component_nodes(cfg, pc, comp_axis):
            # Clamp addressing (the reference's sampler semantics): weights
            # keep their nominal node positions so partition of unity and
            # interior affine-exactness hold; out-of-range fetches reuse
            # the edge value.
            ic = [jnp.clip(idx[ax], 0, dims_hi[ax] - 1) for ax in range(3)]
            lin = (ic[0] * sy + ic[1]) * sz + ic[2]
            gi = gflat[lin]
            vk = vk + wgt * gi
            for ax in range(3):
                brow[ax] = brow[ax] + wgt * gi * dxm[ax]
        vels.append(vk)
        scale = 4.0 * m * m  # D^-1 per axis
        crows.append(jnp.stack([brow[ax] * scale[ax] for ax in range(3)], -1))

    vel = jnp.stack(vels, axis=-1)
    C = jnp.stack(crows, axis=1)  # (N, 3, 3), rows indexed by component
    return vel, C


# -- packed G2P fast path ----------------------------------------------------
#
# The oracle g2p gathers 27 single elements per component per particle
# (81 x N element-gathers ~ 0.7 s at 1M on v5e).  All 27 nodes of one
# component fit in ONE PackedPhi9-style row: 3x3 (x,y)-corners x a 32-lane
# z-window (stride 30 keeps base_z+2 in-window), so the packed path costs
# 3 x N ~1.1 KB row gathers (~30 ms at 1M) plus in-register spline math.
# Rows are EDGE-padded (1 low / 2 high per axis) so out-of-range nodes
# reuse the boundary value — exactly the oracle's clamp addressing, with
# the nominal node positions kept in the weights/levers.

_S = 30
_L9 = 32


def pack_mac9(grid):
    """Pack one MAC component grid into (rows, dims, ns).

    rows[(px * (gy+1) + py) * ns + s] holds the 3x3 corner z-segments
    [30s, 30s+32) of the (1,2)-edge-padded grid; px = base_x + 1 for
    base_x in [-1, gx-1] (likewise y); lane l is padded-z index 30s + l,
    i.e. node index 30s + l - 1."""
    gx, gy, gz = grid.shape
    ns = gz // _S + 1
    zhi = _S * (ns - 1) + _L9 - (gz + 1)
    gp = jnp.pad(grid, ((1, 2), (1, 2), (1, zhi)), mode="edge")
    seg = jnp.stack([gp[..., _S * s: _S * s + _L9] for s in range(ns)],
                    axis=-2)  # (gx+3, gy+3, ns, L)
    rows = jnp.stack(
        [seg[dx: dx + gx + 1, dy: dy + gy + 1]
         for dx in range(3) for dy in range(3)],
        axis=3,
    )  # (gx+1, gy+1, ns, 9, L)
    return rows.reshape((gx + 1) * (gy + 1) * ns, 9 * _L9), grid.shape, ns


def g2p_apic_packed(cfg: SimConfig, pos, u, v, w):
    """g2p_apic via one packed-row gather per component (same math, packed
    reduction order; equality tested to fp tolerance)."""
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    m = jnp.array([nx, ny, nz], jnp.float32)
    pc = pos * m
    n = pos.shape[0]

    vels, crows = [], []
    for comp_axis, grid in ((0, u), (1, v), (2, w)):
        rows2d, (gx, gy, gz), ns = pack_mac9(grid)
        t = [pc[:, ax] + (0.5 if ax == comp_axis else 0.0) for ax in range(3)]
        base = [jnp.floor(ta - 0.5).astype(jnp.int32) for ta in t]
        px, py = base[0] + 1, base[1] + 1
        pz = base[2] + 1
        seg = pz // _S
        key = (px * (gy + 1) + py) * ns + seg
        rows = rows2d[key].reshape(n, 9, _L9)

        lane = jax.lax.broadcasted_iota(jnp.float32, (1, _L9), 1)
        # node z coordinate of lane l: 30*seg + l - 1
        znode = jnp.float32(_S) * seg[:, None].astype(jnp.float32) + lane - 1.0
        dz = t[2][:, None] - znode
        wz = _quad_spline(dz)  # auto-zero outside the 3-node support
        zred = (rows * wz[:, None, :]).sum(-1)          # (N, 9)
        zred_dz = (rows * (wz * (-dz / m[2]))[:, None, :]).sum(-1)

        wx = [_quad_spline(t[0] - (base[0] + a).astype(jnp.float32))
              for a in range(3)]
        wy = [_quad_spline(t[1] - (base[1] + b).astype(jnp.float32))
              for b in range(3)]
        dxx = [((base[0] + a).astype(jnp.float32) - t[0]) / m[0]
               for a in range(3)]
        dyy = [((base[1] + b).astype(jnp.float32) - t[1]) / m[1]
               for b in range(3)]

        vk = jnp.zeros(n, jnp.float32)
        bx = jnp.zeros(n, jnp.float32)
        by = jnp.zeros(n, jnp.float32)
        bz = jnp.zeros(n, jnp.float32)
        for a in range(3):
            for b in range(3):
                wab = wx[a] * wy[b]
                zc = zred[:, 3 * a + b]
                vk = vk + wab * zc
                bx = bx + wab * dxx[a] * zc
                by = by + wab * dyy[b] * zc
                bz = bz + wab * zred_dz[:, 3 * a + b]
        vels.append(vk)
        scale = 4.0 * m * m
        crows.append(jnp.stack(
            [bx * scale[0], by * scale[1], bz * scale[2]], -1))

    vel = jnp.stack(vels, axis=-1)
    C = jnp.stack(crows, axis=1)
    return vel, C
