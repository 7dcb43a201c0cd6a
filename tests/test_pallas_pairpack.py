"""Pallas pair-pack kernel (core/pallas_pairpack.py): bit-equality of the
padded-U-layout fat tables and of everything interpolated through them."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsimulation_tpu.core.interp_packed import (
    interp_mac3_packed_pair_vec,
    interp_mac3_packed_vec,
    pack_mac3,
    pack_mac3_pair,
)
from fluidsimulation_tpu.core.pallas_pairpack import (
    pack_mac3_pair_pallas,
    pack_mac3_pair_padded,
    pairpack_fits,
)


def _grids(rng, nx, ny, nz):
    shapes = ((nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1))
    ga = tuple(rng.normal(size=s).astype(np.float32) for s in shapes)
    gb = tuple(rng.normal(size=s).astype(np.float32) for s in shapes)
    return ga, gb


@pytest.mark.parametrize("dims", [(16, 16, 16), (8, 16, 24), (16, 8, 40)])
def test_pairpack_pallas_matches_padded_twin(dims):
    nx, ny, nz = dims
    assert pairpack_fits(dims)
    rng = np.random.default_rng(11)
    ga, gb = _grids(rng, nx, ny, nz)
    ref = pack_mac3_pair_padded(ga, gb)
    ker = pack_mac3_pair_pallas(ga, gb)
    for r, k, name in zip(ref, ker, "UVW"):
        assert r.shape == k.shape, name
        np.testing.assert_array_equal(np.asarray(r), np.asarray(k), err_msg=name)


def test_padded_layout_interp_bit_identical():
    """The padded-U-stride tables interpolate bit-identically to the plain
    pair tables (stride inferred from the row count)."""
    nx, ny, nz = 16, 16, 16
    rng = np.random.default_rng(5)
    ga, gb = _grids(rng, nx, ny, nz)
    q = rng.uniform(-0.2, 1.2, size=(700, 3)).astype(np.float32) * nx

    plain = pack_mac3_pair(ga, gb)
    padded = pack_mac3_pair_padded(ga, gb)
    assert padded[0].shape[0] > plain[0].shape[0]  # dead U rows exist
    va, vb = interp_mac3_packed_pair_vec(*plain, (nx, ny, nz), jnp.asarray(q))
    wa, wb = interp_mac3_packed_pair_vec(*padded, (nx, ny, nz), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(wa))
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(wb))


def test_padded_plain_half_slices_interp_bit_identical():
    """flip_update_carry slices the fat tables' new-grid half into plain
    512 B tables for the advect cache; the padded-layout slices must
    interpolate bit-identically to pack_mac3 of the new grids."""
    nx, ny, nz = 16, 16, 16
    rng = np.random.default_rng(7)
    ga, gb = _grids(rng, nx, ny, nz)
    q = rng.uniform(-0.2, 1.2, size=(700, 3)).astype(np.float32) * nx

    padded = pack_mac3_pair_padded(ga, gb)
    L = padded[0].shape[1] // 2
    sliced = tuple(t[:, L:] for t in padded)
    ref = pack_mac3(*gb)
    got = interp_mac3_packed_vec(*sliced, (nx, ny, nz), jnp.asarray(q))
    want = interp_mac3_packed_vec(*ref, (nx, ny, nz), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_flip_update_carry_pallas_routing_bit_identical():
    """flip_update_carry(pallas=True) == (pallas=False): same velocities,
    same cache interpolation behavior."""
    from fluidsimulation_tpu.core.config import SimConfig
    from fluidsimulation_tpu.ops.flip import flip_update_carry

    nx = ny = nz = 16
    cfg = SimConfig(nx=nx, ny=ny, nz=nz, cells_per_meter=float(nx),
                    particles_per_cell_axis=2)
    rng = np.random.default_rng(3)
    n = 500
    pos = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    shapes = ((nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1))
    new = [rng.normal(size=s).astype(np.float32) for s in shapes]
    old = [rng.normal(size=s).astype(np.float32) for s in shapes]
    alpha = jnp.float32(0.03)

    v0, c0 = flip_update_carry(cfg, jnp.asarray(pos), jnp.asarray(vel),
                               *map(jnp.asarray, new), *map(jnp.asarray, old),
                               alpha, pallas=False)
    v1, c1 = flip_update_carry(cfg, jnp.asarray(pos), jnp.asarray(vel),
                               *map(jnp.asarray, new), *map(jnp.asarray, old),
                               alpha, pallas=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(c0.k1), np.asarray(c1.k1))
    q = rng.uniform(0.0, 1.0, size=(300, 3)).astype(np.float32) * nx
    a = interp_mac3_packed_vec(c0.pu, c0.pv, c0.pw, (nx, ny, nz),
                               jnp.asarray(q))
    b = interp_mac3_packed_vec(c1.pu, c1.pv, c1.pw, (nx, ny, nz),
                               jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
