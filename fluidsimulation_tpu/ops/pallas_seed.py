"""Pallas TPU kernel: the 27-neighborhood closest-candidate pass.

Same Element-indexed halo-tile pattern as ops/pallas_p2g.py, applied to
ops/levelset.neighborhood_pass (the TPU form of
gpComputeClosestParticleNeighbors.hlsl's neighborhood scan): each cell takes
the best per-neighbor-cell candidate position over its 27-neighborhood.
The XLA formulation reads 27 shifted windows of the candidate field from
HBM; here each tile is read once into VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig
from .levelset import FAR


def neighborhood_pass_pallas(cfg: SimConfig, cpos0, tx: int = 4, ty: int = 8):
    """cpos0: (nx, ny, nz, 3) candidate positions (FAR where none).
    Returns (phi, cpos) like ops/levelset.neighborhood_pass."""
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    r = float(cfg.particle_radius)
    assert nx % tx == 0 and ny % ty == 0

    # Dummy axis 2: TPU constrains the last two block dims, so keep them
    # full-size (1, nz+2) and put the halo dims in front (as in pallas_p2g).
    fields = [
        jnp.pad(
            cpos0[..., i], ((1, 1), (1, 1), (1, 1)), constant_values=FAR
        )[:, :, None, :]
        for i in range(3)
    ]  # (nx+2, ny+2, 1, nz+2)

    def kernel(cx_ref, cy_ref, cz_ref, phi_ref, ox_ref, oy_ref, oz_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = jnp.asarray(i * tx, jnp.float32)
        y0 = jnp.asarray(j * ty, jnp.float32)
        fx = x0 + jax.lax.broadcasted_iota(jnp.int32, (tx, ty, nz), 0).astype(jnp.float32)
        fy = y0 + jax.lax.broadcasted_iota(jnp.int32, (tx, ty, nz), 1).astype(jnp.float32)
        fz = jax.lax.broadcasted_iota(jnp.int32, (tx, ty, nz), 2).astype(jnp.float32)

        cx = cx_ref[:, :, 0, :]
        cy = cy_ref[:, :, 0, :]
        cz = cz_ref[:, :, 0, :]
        phi = jnp.full((tx, ty, nz), jnp.inf, jnp.float32)
        bx = jnp.full((tx, ty, nz), FAR, jnp.float32)
        by = jnp.full((tx, ty, nz), FAR, jnp.float32)
        bz = jnp.full((tx, ty, nz), FAR, jnp.float32)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    sl = (
                        slice(1 + dx, 1 + dx + tx),
                        slice(1 + dy, 1 + dy + ty),
                        slice(1 + dz, 1 + dz + nz),
                    )
                    ax = cx[sl]
                    ay = cy[sl]
                    az = cz[sl]
                    dist = (
                        jnp.sqrt(
                            (ax - fx) ** 2 + (ay - fy) ** 2 + (az - fz) ** 2
                        )
                        - r
                    )
                    better = dist < phi
                    phi = jnp.where(better, dist, phi)
                    bx = jnp.where(better, ax, bx)
                    by = jnp.where(better, ay, by)
                    bz = jnp.where(better, az, bz)
        phi_ref[:] = phi
        ox_ref[:] = bx
        oy_ref[:] = by
        oz_ref[:] = bz

    in_spec = pl.BlockSpec(
        (pl.Element(tx + 2), pl.Element(ty + 2), pl.Element(1), pl.Element(nz + 2)),
        lambda i, j: (i * tx, j * ty, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (tx, ty, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    phi, ox, oy, oz = pl.pallas_call(
        kernel,
        grid=(nx // tx, ny // ty),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32) for _ in range(4)
        ),
        in_specs=[in_spec] * 3,
        out_specs=(out_spec,) * 4,
        interpret=jax.default_backend() != "tpu",
    )(*fields)
    return phi, jnp.stack([ox, oy, oz], axis=-1)
