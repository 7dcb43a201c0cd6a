"""Simulation state pytrees.

The reference stores particle state as an AoS structured buffer
(ParticleDefs.h:39-60) and grids as D3D11 Texture3Ds (Simulation.h:91-130).
Here state is a pytree of HBM-resident arrays: SoA particles (pos/vel as
(N,3) float32, better for TPU vectorization than AoS) plus the MAC grids and
the cell-centered level set.  One timestep is a pure function
``step(state, dt, cfg) -> state`` under a single jit; XLA program order
replaces the reference's dispatch-ordering synchronization (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from .config import SimConfig
from .seeding import dam_break_particles


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Full 3D solver state (externalizable; see utils/checkpoint.py).

    pos, vel : (N, 3) float32, meters / m/s
    u, v, w  : MAC velocity grids, indexed [x, y, z]
               shapes (nx+1,ny,nz), (nx,ny+1,nz), (nx,ny,nz+1)
    phi      : (nx, ny, nz) level set in *cell* units (Simulation3D.h:156-158)
    """

    pos: Any
    vel: Any
    u: Any
    v: Any
    w: Any
    phi: Any


def init_state(cfg: SimConfig) -> SimState:
    """Dam-break initial state matching GPFluidSim::ResetSimulation
    (Simulation.cpp:39-90): jittered particle block, zero velocities,
    zero velocity grids, phi cleared to +inf."""
    pos, vel = dam_break_particles(cfg)
    f32 = np.float32
    return SimState(
        pos=pos,
        vel=vel,
        u=np.zeros(cfg.u_shape(), f32),
        v=np.zeros(cfg.v_shape(), f32),
        w=np.zeros(cfg.w_shape(), f32),
        phi=np.full(cfg.grid_shape(), np.inf, f32),
    )


def device_put_state(state: SimState, sharding=None) -> SimState:
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if sharding is not None else jax.device_put(x),
        state,
    )
