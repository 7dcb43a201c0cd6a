"""The 3D solver step: one frame of simulation as a single pure function.

Composes the op set in the order of GPFluidSim::Simulate
(Simulation.cpp:513-566):

  advect -> [bin] -> level set (seed + 24 sweeps) -> P2G -> extrapolate
  -> snapshot old grids -> gravity -> project (RHS/diag/SOR x100/apply)
  -> FLIP blend -> blur phi

Everything runs under one ``jax.jit``: XLA program order replaces the
reference's dispatch-order synchronization, the old-grid snapshot is just a
value binding (no CopyResource), and the reference's 52 ms host prefix-sum
round-trip (Simulation.cpp:657) does not exist — binning is a device-side
cumsum (ops/binning.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.state import SimState
from ..ops.advect import advect_rk3
from ..ops.binning import bin_particles
from ..ops.blur import blur_phi
from ..ops.extrapolate import extrapolate_one_ring
from ..ops.flip import flip_update
from ..ops.forces import add_gravity
from ..ops.levelset import compute_level_set
from ..ops.p2g import transfer_to_grid
from ..ops.project import project


def pic_flip_alpha(cfg: SimConfig, dt):
    """alpha = clamp(6*dt*nu*cpm^2, 0, 1) (Simulation.cpp:541)."""
    return jnp.clip(
        6.0 * dt * jnp.float32(cfg.nu * cfg.cells_per_meter**2), 0.0, 1.0
    )


def step(state: SimState, dt, cfg: SimConfig, bin_first: bool = True) -> SimState:
    """Advance the simulation by one (already clamped) dt.

    dt may be a traced scalar; cfg must be static.  ``bin_first`` sorts
    particles by cell before the scatter stages (counting sort, replacing the
    reference's count/prefix-sum/bin pipeline); the sorted order improves
    scatter locality but is not required for correctness.
    """
    pos = advect_rk3(cfg, state.u, state.v, state.w, state.pos, dt)
    vel = state.vel

    if bin_first:
        _, _, pos, vel, _ = bin_particles(cfg, pos, vel)

    phi, _ = compute_level_set(cfg, pos)

    u, v, w, uv, vv, wv = transfer_to_grid(cfg, pos, vel)
    u = extrapolate_one_ring(u, uv)
    v = extrapolate_one_ring(v, vv)
    w = extrapolate_one_ring(w, wv)

    old_u, old_v, old_w = u, v, w  # snapshot (Simulation.cpp:529-531)

    v = add_gravity(cfg, v, dt)
    u, v, w, _ = project(cfg, u, v, w, phi, dt)

    alpha = pic_flip_alpha(cfg, dt)
    vel = flip_update(cfg, pos, vel, u, v, w, old_u, old_v, old_w, alpha)

    phi = blur_phi(phi)

    return SimState(pos=pos, vel=vel, u=u, v=v, w=w, phi=phi)


@functools.partial(jax.jit, static_argnames=("cfg", "bin_first"))
def step_jit(state: SimState, dt, cfg: SimConfig, bin_first: bool = True) -> SimState:
    return step(state, dt, cfg, bin_first)


def clamp_dt(cfg: SimConfig, dt, simulation_rate: float = 1.0):
    """dt clamp (Simulation.cpp:515): dt*rate clamped to [0, max_dt]."""
    return float(min(max(dt * simulation_rate, 0.0), cfg.max_dt))
