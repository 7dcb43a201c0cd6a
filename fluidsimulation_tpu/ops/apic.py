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
  and is the oracle for any future packed/Pallas fast path.  Measured
  cost of the tier (TPU v5e, scripts/bench_apic.py): 2053 ms/step at
  64^3 / 953k vs the PIC/FLIP fast path's 92 ms — exactly the
  transaction arithmetic (27 nodes x 3 components x 1M each way at
  ~9 ns/elem ≈ 1.5 s); a fast path would reuse the supercell-table /
  packed-row machinery the FLIP path uses.

Exactness property (tested): affine velocity fields v(x) = v0 + A(x-x0)
round-trip P2G -> G2P unchanged (quadratic B-splines reproduce linears),
and total momentum is conserved by P2G (sum_i w_ip (x_i-x_p) = 0).
"""

from __future__ import annotations

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
