"""Pallas TPU kernels: fast-sweeping level-set propagation.

The XLA formulation (ops/levelset.sweep_closest) runs 24 ``lax.scan``s of
~n steps each — ~3000 tiny sequential device steps whose per-step overhead
dominates.  Here each directional sweep is ONE kernel: the serial loop runs
inside (VMEM-resident planes, no per-step dispatch), with the orthogonal
plane vectorized across sublanes/lanes and tiled over the grid dimension —
the same plane-of-threads layout as the reference's sweep dispatches
(gpClosestParticlesSweepXm.hlsl:20-42).

The swept axis is always the MAJOR axis: callers pre-permute phi/candidate
fields so sweeps along y and z become axis-0 sweeps of transposed arrays
(XLA transposes are cheap relative to the scan overhead they remove).
Update rule is identical to _sweep_axis in ops/levelset.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig
from .levelset import _CODE, SWEEP_ORDER


def _sweep_kernel(n0, ty, n2, r, reverse, phi_in, cx_in, cy_in, cz_in,
                  phi_out, cx_out, cy_out, cz_out):
    j = pl.program_id(0)
    a0 = jnp.asarray(j * ty, jnp.float32)
    ia = a0 + jax.lax.broadcasted_iota(jnp.int32, (1, ty, n2), 1).astype(jnp.float32)
    ib = jax.lax.broadcasted_iota(jnp.int32, (1, ty, n2), 2).astype(jnp.float32)

    # Plane 0 (or n0-1 when reversed) is never updated: copy everything
    # first, then overwrite visited planes.
    phi_out[:] = phi_in[:]
    cx_out[:] = cx_in[:]
    cy_out[:] = cy_in[:]
    cz_out[:] = cz_in[:]

    start = n0 - 1 if reverse else 0
    carry0 = (
        cx_in[pl.ds(start, 1)],
        cy_in[pl.ds(start, 1)],
        cz_in[pl.ds(start, 1)],
    )

    def body(k, carry):
        ccx, ccy, ccz = carry
        x = (n0 - 1 - k) if reverse else k
        xf = jnp.asarray(x, jnp.float32)
        phi_p = phi_in[pl.ds(x, 1)]
        ox = cx_in[pl.ds(x, 1)]
        oy = cy_in[pl.ds(x, 1)]
        oz = cz_in[pl.ds(x, 1)]
        d = jnp.sqrt(
            (ccx - xf) ** 2 + (ccy - ia) ** 2 + (ccz - ib) ** 2
        ) - r
        better = d < phi_p
        phi_out[pl.ds(x, 1)] = jnp.where(better, d, phi_p)
        cx_out[pl.ds(x, 1)] = jnp.where(better, ccx, ox)
        cy_out[pl.ds(x, 1)] = jnp.where(better, ccy, oy)
        cz_out[pl.ds(x, 1)] = jnp.where(better, ccz, oz)
        return (
            jnp.where(better, ccx, ox),
            jnp.where(better, ccy, oy),
            jnp.where(better, ccz, oz),
        )

    jax.lax.fori_loop(1, n0, body, carry0)


_DEFAULT_SCOPED_VMEM = 16 * 1024 * 1024
_VMEM_CAP = 100 * 1024 * 1024  # v5e has 128 MB VMEM/core; leave headroom


def _sweep_block_bytes(n0: int, ty: int, n2: int) -> int:
    """Pipelined block footprint of one sweep: 8 blocks (4 in + 4 out) of
    (n0, ty, lanes) f32, double-buffered.  Matches the Mosaic scoped-vmem
    accounting exactly (measured: 32 MiB reported at 256^3, ty=8)."""
    lanes = -(-n2 // 128) * 128
    return 2 * 8 * n0 * ty * lanes * 4


def sweeps_fit_vmem(cfg: SimConfig, ty: int = 8) -> bool:
    """Whether every one of the 24 sweeps (each permutes a different axis
    to major/lanes) fits VMEM with the limit raised to _VMEM_CAP.  Beyond
    this (grids ~> 350^3) callers fall back to the XLA scan sweeps."""
    dims = sorted((cfg.nx, cfg.ny, cfg.nz))
    # Worst permutation: the two largest dims land on (major, lanes).
    return _sweep_block_bytes(dims[2], ty, dims[1]) + 4 * 1024 * 1024 <= _VMEM_CAP


def _sweep_major(r, reverse, phi, cx, cy, cz, ty=8):
    """One directional sweep along axis 0; (phi, cx, cy, cz) are (n0, n1, n2)
    with cx = candidate coordinate along axis 0, cy along axis 1, cz along
    axis 2 (i.e. components already permuted to match the layout)."""
    n0, n1, n2 = phi.shape
    assert n1 % ty == 0
    kernel = functools.partial(_sweep_kernel, n0, ty, n2, r, reverse)
    spec = pl.BlockSpec((n0, ty, n2), lambda j: (0, j, 0), memory_space=pltpu.VMEM)
    # Mosaic's default scoped-VMEM limit is 16 MiB; the block set scales
    # with n0*n2 and exceeds it at >=256^3.  Raise the limit only when
    # needed (keeps <=128^3 programs byte-identical); sweeps_fit_vmem gates
    # grids whose blocks would exceed the raised cap.
    need = _sweep_block_bytes(n0, ty, n2)
    params = {}
    if need > _DEFAULT_SCOPED_VMEM:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(_VMEM_CAP, need + 4 * 1024 * 1024)
        )
    return pl.pallas_call(
        kernel,
        grid=(n1 // ty,),
        out_shape=tuple(
            jax.ShapeDtypeStruct(phi.shape, jnp.float32) for _ in range(4)
        ),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 4,
        interpret=jax.default_backend() != "tpu",
        **params,
    )(phi, cx, cy, cz)


def sweep_closest_pallas(cfg: SimConfig, phi, cpos, ty: int = 8):
    """All 24 sweeps in the reference order (Simulation.cpp:744-753);
    equivalent to ops/levelset.sweep_closest."""
    r = float(cfg.particle_radius)
    cx, cy, cz = cpos[..., 0], cpos[..., 1], cpos[..., 2]
    comps = [cx, cy, cz]
    for code in SWEEP_ORDER:
        axis, reverse = _CODE[code]
        # Permute so the swept axis is major; candidate components follow.
        perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
        inv = {0: (0, 1, 2), 1: (1, 0, 2), 2: (1, 2, 0)}[axis]
        phi_m = jnp.transpose(phi, perm)
        f = [jnp.transpose(comps[p], perm) for p in perm]
        phi_m, f0, f1, f2 = _sweep_major(r, reverse, phi_m, f[0], f[1], f[2], ty)
        phi = jnp.transpose(phi_m, inv)
        out = [f0, f1, f2]
        comps = [jnp.transpose(out[perm.index(c)], inv) for c in range(3)]
    return phi, jnp.stack(comps, axis=-1)
