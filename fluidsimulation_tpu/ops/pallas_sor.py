"""Pallas TPU kernel: VMEM-resident checkerboard SOR.

The XLA formulation of the pressure solve (ops/project.py::sor_pressure)
re-reads p/phi/diag/b from HBM every half-iteration — already fused to one
HBM pass per half-update (~10 ms at 128^3), but at 64^3 the whole working
set (4 x 1 MB) fits in VMEM, so 100 iterations can run entirely on-chip:
one HBM read of the inputs, 200 VPU half-updates, one HBM write of p.

Numerics are identical to sor_pressure (same masked half-updates, same
omega); used automatically for grids whose working set fits VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig

# Mosaic stack-allocates every live vector temporary against a 16 MB scoped
# VMEM limit; measured round 1: this kernel compiles up to 48^3 under the
# default limit (~17.2 MB of stack at 64^3 even with slice-wise updates —
# the minor-axis shifted loads each pin a full-array relayout temp).
#
# Round 4 follow-up (scripts/diag_sor64.py): the scoped limit IS raisable
# (pallas_sweep proved 32 MiB works through the axon remote compile) and
# 64^3 then COMPILES — but measures a WASH vs the fused XLA form (16.34
# vs 15.15 ms on real step-8 solve inputs; the per-half-iteration z-shift
# relayouts eat the HBM saving) and is no longer bit-equal (9.8e-3 max
# diff after 100 iterations; different codegen under the raised cap).
# So the auto-gate stays at the round-1 ≤48^3 budget where the kernel is
# both a measured win and equality-tested; the raised-cap path is kept
# for callers forcing larger grids (128^3 remains impossible: ~24 live
# full-array equivalents x 8.4 MB > the chip's VMEM).
_VMEM_BUDGET_BYTES = 3 * 1024 * 1024
_RAISED_CAP = 48 * 1024 * 1024
_DEFAULT_SCOPED_VMEM = 16 * 1024 * 1024


def _stack_estimate(cells: int) -> int:
    """Measured stack scaling: ~17.2 MiB at 64^3 + the 7 explicit arrays
    (3 in, 1 out, 3 scratch) = ~24 full-array equivalents."""
    return 24 * cells * 4


def fits_vmem(cfg: SimConfig) -> bool:
    cells = cfg.nx * cfg.ny * cfg.nz
    return 4 * cells * 4 <= _VMEM_BUDGET_BYTES


def _shift_val(a, axis, s):
    """Zero-padded shift on a loaded value: out[i] = a[i+s]."""
    pad = [(0, 0)] * a.ndim
    sl = [slice(None)] * a.ndim
    if s > 0:
        pad[axis] = (0, s)
        sl[axis] = slice(s, None)
    else:
        pad[axis] = (-s, 0)
        sl[axis] = slice(0, s)
    return jnp.pad(a, pad)[tuple(sl)]


def _sor_kernel(
    iters, omega, phi_ref, diag_ref, b_ref, p_ref, fluid_ref, par_ref, nms_ref
):
    """Scratch refs hold the 0/1 fluid mask, checkerboard parity, and the
    neighbor-sum accumulator; writing through refs between steps caps the
    live temporary set (Mosaic stack-allocates every live vector temp).
    Mosaic can't pad i1 vectors, so masks are 0/1 floats combined by
    multiply (exact)."""
    phi = phi_ref[:]
    nx, ny, nz = phi.shape
    fluid_ref[:] = jnp.where(phi < 0.0, 1.0, 0.0)
    xg = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 0)
    yg = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 1)
    zg = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 2)
    par_ref[:] = ((xg + yg + zg) % 2).astype(jnp.float32)
    p_ref[:] = jnp.zeros_like(phi)

    def _lo(axis):
        sl = [slice(None)] * 3
        sl[axis] = slice(0, (nx, ny, nz)[axis] - 1)
        return tuple(sl)

    def _hi(axis):
        sl = [slice(None)] * 3
        sl[axis] = slice(1, None)
        return tuple(sl)

    def half(color_is_odd):
        # Accumulate -sum(fluid_nb * p_nb) via slice-aligned updates (no
        # padded full-array temporaries — keeps the VMEM stack small).
        nms_ref[:] = jnp.zeros((nx, ny, nz), jnp.float32)
        for axis in range(3):
            lo, hi = _lo(axis), _hi(axis)
            nms_ref[lo] = nms_ref[lo] - fluid_ref[hi] * p_ref[hi]
            nms_ref[hi] = nms_ref[hi] - fluid_ref[lo] * p_ref[lo]
        # upd stored in-place in nms_ref; statements kept small so the
        # Mosaic stack never holds more than a few temporaries.
        nms_ref[:] = omega * (b_ref[:] - nms_ref[:]) / diag_ref[:]
        nms_ref[:] = nms_ref[:] + (1.0 - omega) * p_ref[:]
        par = par_ref[:]
        color_f = par if color_is_odd else 1.0 - par
        p_ref[:] = p_ref[:] + fluid_ref[:] * color_f * (nms_ref[:] - p_ref[:])

    def body(_, carry):
        half(False)
        half(True)
        return carry

    jax.lax.fori_loop(0, iters, body, 0)


def sor_pressure_pallas(cfg: SimConfig, phi, diag, b, iterations=None,
                        interpret: bool | None = None):
    iters = cfg.sor_iterations if iterations is None else iterations
    omega = float(cfg.omega)  # static Python constant, baked into the kernel
    kernel = functools.partial(_sor_kernel, iters, omega)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cells = b.shape[0] * b.shape[1] * b.shape[2]
    params = {}
    need = _stack_estimate(cells)
    if need > _DEFAULT_SCOPED_VMEM:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(_RAISED_CAP, need + 4 * 1024 * 1024)
        )
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct(b.shape, jnp.float32),
        **params,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(b.shape, jnp.float32),  # fluid mask
            pltpu.VMEM(b.shape, jnp.float32),  # parity
            pltpu.VMEM(b.shape, jnp.float32),  # neighbor-sum accumulator
        ],
    )(phi, diag, b)
