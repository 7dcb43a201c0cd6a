"""Simulation configuration.

The reference keeps all of its configuration as compile-time constants
scattered across the demo driver (FluidSimDemo.cpp:53-55,93), the solver
headers (Simulation.h:64-84), and inline kernel constants (e.g. rho at
gpProjectComputeRHS.hlsl:20, 100 SOR iterations at Simulation.cpp:910).
Here every knob lives in one frozen dataclass that is hashable, so a
``SimConfig`` can be passed as a static argument to ``jax.jit`` — it plays
the role of both the reference's constants *and* its 12-float cbuffer ABI
(gpStdParameters.hlsli:3-9).
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static configuration of a 3D (or 2D, with nz==0) PIC/FLIP simulation.

    Mirrors the reference's constants:
      nx, ny, nz          : grid size in cells (FluidSimDemo.cpp:53-55)
      cells_per_meter     : grid resolution (FluidSimDemo.cpp:93)
      rho                 : fluid density, kg/m^3 (Simulation.h:72)
      gravity_y           : gravity on the V grid, m/s^2 (Simulation.h:75)
      nu                  : kinematic viscosity, m^2/s (Simulation.h:78)
      particle_radius     : level-set particle radius in *cells*
                            (Simulation.h:81-82: >= sqrt(3)/2 in 3D)
      sor_iterations      : checkerboard SOR iterations (Simulation.cpp:910)
      max_dt              : dt clamp, s (Simulation.cpp:515 clamps to 1/15)
      seed                : LCG seed for the dam-break jitter
                            (Simulation.cpp:40: std::minstd_rand(0))
      particles_per_cell_axis : particles seeded per cell axis in the
                            dam-break block (2 -> 8 per cell, Simulation.cpp:57-59)
    """

    nx: int = 64
    ny: int = 64
    nz: int = 64
    cells_per_meter: float = 64.0
    rho: float = 1000.0
    gravity_y: float = -9.81
    nu: float = 8.90e-4 / 1000.0
    particle_radius: float = 1.0
    sor_iterations: int = 100
    max_dt: float = 1.0 / 15.0
    seed: int = 0
    particles_per_cell_axis: int = 2
    # Ghost-fluid ratio clamp (Simulation3D.cpp:823, gpProjectComputeDiagCoeffs.hlsl:25)
    max_ls_ratio: float = 1000.0
    # P2G valid-weight threshold (Simulation3D.cpp:565, gpTransferParticleVelocitiesU.hlsl:61)
    zero_thresh: float = 0.01
    # Exact-fallback budget for particles past the dense table's K slots
    # (ops/celltable.py): the reference's per-cell lists are unbounded
    # (gpParticleIndexing.hlsli:28-45), so overflow beyond this cap would be
    # subsampled — drivers auto-raise it from the measured n_overflow
    # (solver/step3d.py::overflow_autotune) so the default path stays exact.
    # Static: each tier is its own compiled program (cached on disk).
    overflow_cap: int = 4096

    @property
    def omega(self) -> float:
        """Tuned SOR over-relaxation factor.

        3D model: omega = 2 - 3.16343/nx (Simulation.cpp:909, derivation
        Simulation3D.cpp:922-944).
        """
        return 2.0 - 3.16343 / self.nx

    @property
    def dx(self) -> float:
        return 1.0 / self.cells_per_meter

    @property
    def num_particles(self) -> int:
        """Number of dam-break particles (Simulation.cpp:47-74).

        Cells x in [nx/2, nx-1), y in [1, ny-1), z in [1, nz-1), with
        particles_per_cell_axis^3 particles per cell.  For the 64^3 demo this
        is 31*62*62*8 = 953,312.
        """
        ppc = self.particles_per_cell_axis ** 3
        return (self.nx - 1 - self.nx // 2) * (self.ny - 2) * (self.nz - 2) * ppc

    def grid_shape(self) -> tuple[int, int, int]:
        return (self.nx, self.ny, self.nz)

    def u_shape(self) -> tuple[int, int, int]:
        return (self.nx + 1, self.ny, self.nz)

    def v_shape(self) -> tuple[int, int, int]:
        return (self.nx, self.ny + 1, self.nz)

    def w_shape(self) -> tuple[int, int, int]:
        return (self.nx, self.ny, self.nz + 1)


@dataclasses.dataclass(frozen=True)
class SimConfig2D:
    """2D analogue (Simulation2D.h).  Kept separate: the 2D solver differs in
    more than rank (4-sweep level set, 120 SOR iterations, curl-noise init)."""

    nx: int = 64
    ny: int = 64
    cells_per_meter: float = 64.0
    rho: float = 1000.0
    gravity_y: float = -9.81
    nu: float = 8.90e-4 / 1000.0
    # 2D particle radius: 2/sqrt(2) (Simulation2D.h:203)
    particle_radius: float = 2.0 / math.sqrt(2.0)
    sor_iterations: int = 120
    max_dt: float = 1.0 / 15.0
    seed: int = 0
    max_ls_ratio: float = 1000.0
    zero_thresh: float = 0.01

    @property
    def omega(self) -> float:
        """2D model: omega = 2 - 3.22133/nx (Simulation2D.cpp:699)."""
        return 2.0 - 3.22133 / self.nx

    @property
    def dx(self) -> float:
        return 1.0 / self.cells_per_meter

    @property
    def num_particles(self) -> int:
        """Dam-break particle count (Simulation2D.cpp:62-77): 4 per cell."""
        return (self.nx - 1 - self.nx // 2) * (self.ny - 2) * 4
