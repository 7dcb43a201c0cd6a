"""2D APIC stepper — the extension family on the 2D solver tier.

Mirrors the reference's own methodology (2D stepping-stone first,
Simulation2D.cpp): the same quadratic-B-spline affine transfer as
ops/apic.py, in 2D (9 nodes per component, C rows (N, 2, 2),
D = dx^2/4 I per axis so C = 4 B m^2).  At 2D problem sizes the direct
scatter/gather formulation IS the production path (no fast-path tiers
needed); it doubles as the dimensional oracle for the 3D method.

Pipeline reuses solver/step2d.py's stages (advect, 2D level set,
full-grid extrapolation, 2D ghost-fluid projection); only the transfer
pair differs, exactly like solver/apic.py vs step3d.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import SimConfig2D
from ..ops.apic import _quad_spline
from .step2d import (
    advect_rk3,
    compute_level_set,
    extrapolate_full,
    init_state2d,
    project,
)

APIC2D_WEIGHT_THRESH = 1e-4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ApicState2D:
    pos: Any  # (N, 2) meters
    vel: Any  # (N, 2) m/s
    C: Any    # (N, 2, 2) 1/s
    u: Any
    v: Any
    phi: Any


def init_apic_state2d(cfg: SimConfig2D) -> ApicState2D:
    s = init_state2d(cfg)
    n = s.pos.shape[0]
    return ApicState2D(
        pos=s.pos, vel=s.vel, C=jnp.zeros((n, 2, 2), jnp.float32),
        u=s.u, v=s.v, phi=s.phi,
    )


def _nodes2(cfg: SimConfig2D, pc, comp_axis: int):
    """Yield (idx2, ok, w, dxm) for the 9 spline nodes of one component
    (the 2D analogue of ops/apic._component_nodes)."""
    dims = (cfg.nx, cfg.ny)
    t, base = [], []
    for ax in range(2):
        ta = pc[:, ax] + (0.5 if ax == comp_axis else 0.0)
        t.append(ta)
        base.append(jnp.floor(ta - 0.5).astype(jnp.int32))
    for ox in (0, 1, 2):
        for oy in (0, 1, 2):
            offs = (ox, oy)
            idx = [base[ax] + offs[ax] for ax in range(2)]
            ok = jnp.ones(pc.shape[0], bool)
            w = jnp.ones(pc.shape[0], jnp.float32)
            dxm = []
            for ax in range(2):
                hi = dims[ax] + (1 if ax == comp_axis else 0)
                ok = ok & (idx[ax] >= 0) & (idx[ax] < hi)
                d = t[ax] - idx[ax].astype(jnp.float32)
                w = w * _quad_spline(d)
                dxm.append(-d / jnp.float32(dims[ax]))
            yield idx, ok, w, dxm


def p2g_apic2d(cfg: SimConfig2D, pos, vel, C):
    """2D APIC P2G.  Returns (u, v, uv, vv) with step2d's boundary-face
    and validity semantics."""
    nx, ny = cfg.nx, cfg.ny
    m = jnp.array([nx, ny], jnp.float32)
    pc = pos * m

    out = []
    for comp_axis, shape in ((0, (nx + 1, ny)), (1, (nx, ny + 1))):
        pv = vel[:, comp_axis]
        crow = C[:, comp_axis, :]
        sx, sy = shape
        lin_all, w_all, val_all = [], [], []
        for idx, ok, w, dxm in _nodes2(cfg, pc, comp_axis):
            val = pv + crow[:, 0] * dxm[0] + crow[:, 1] * dxm[1]
            lin = idx[0] * sy + idx[1]
            lin_all.append(jnp.where(ok, lin, 0))
            w = jnp.where(ok, w, 0.0)
            w_all.append(w)
            val_all.append(w * val)
        lin = jnp.concatenate(lin_all)
        w = jnp.concatenate(w_all)
        vals = jnp.concatenate(val_all)
        acc = jnp.zeros(sx * sy, jnp.float32).at[lin].add(vals).reshape(shape)
        amt = jnp.zeros(sx * sy, jnp.float32).at[lin].add(w).reshape(shape)
        g = acc / jnp.maximum(amt, jnp.float32(1e-30))
        valid = amt > APIC2D_WEIGHT_THRESH
        if comp_axis == 0:
            g = g.at[0, :].set(0.0).at[nx, :].set(0.0)
            valid = valid.at[0, :].set(True).at[nx, :].set(True)
        else:
            g = g.at[:, 0].set(0.0).at[:, ny].set(0.0)
            valid = valid.at[:, 0].set(True).at[:, ny].set(True)
        out.append((g, valid))

    (u, uv), (v, vv) = out
    return u, v, uv, vv


def g2p_apic2d(cfg: SimConfig2D, pos, u, v):
    """2D APIC G2P with clamp addressing; C = 4 B m^2 per axis."""
    nx, ny = cfg.nx, cfg.ny
    m = jnp.array([nx, ny], jnp.float32)
    pc = pos * m
    n = pos.shape[0]

    vels, crows = [], []
    for comp_axis, grid in ((0, u), (1, v)):
        gflat = grid.reshape(-1)
        sx, sy = grid.shape
        vk = jnp.zeros(n, jnp.float32)
        brow = [jnp.zeros(n, jnp.float32) for _ in range(2)]
        for idx, _ok, wgt, dxm in _nodes2(cfg, pc, comp_axis):
            ic = [jnp.clip(idx[0], 0, sx - 1), jnp.clip(idx[1], 0, sy - 1)]
            gi = gflat[ic[0] * sy + ic[1]]
            vk = vk + wgt * gi
            for ax in range(2):
                brow[ax] = brow[ax] + wgt * gi * dxm[ax]
        vels.append(vk)
        scale = 4.0 * m * m
        crows.append(jnp.stack([brow[0] * scale[0], brow[1] * scale[1]], -1))

    return jnp.stack(vels, axis=-1), jnp.stack(crows, axis=1)


def step_apic2d(state: ApicState2D, dt, cfg: SimConfig2D) -> ApicState2D:
    pos = advect_rk3(cfg, state.u, state.v, state.pos, dt)
    phi, _ = compute_level_set(cfg, pos)
    u, v, uv, vv = p2g_apic2d(cfg, pos, state.vel, state.C)
    iters = cfg.nx + cfg.ny + 2
    u = extrapolate_full(u, uv, iters)
    v = extrapolate_full(v, vv, iters)
    v = v.at[:, 1 : cfg.ny].add(jnp.float32(cfg.gravity_y) * dt)
    u, v, _ = project(cfg, u, v, phi, dt)
    vel, C = g2p_apic2d(cfg, pos, u, v)
    return ApicState2D(pos=pos, vel=vel, C=C, u=u, v=v, phi=phi)


step_apic2d_jit = jax.jit(step_apic2d, static_argnames=("cfg",))
