"""2D solver tests: oracle self-consistency + JAX step parity/stability."""

import numpy as np

from fluidsimulation_tpu.core.config import SimConfig2D
from fluidsimulation_tpu.reference.solver2d import FluidSimRef, reset, vector_curl
from fluidsimulation_tpu.solver.step2d import (
    SimState2D,
    init_state2d,
    step2d_jit,
)

CFG = SimConfig2D(nx=16, ny=16, cells_per_meter=16.0)


def test_curl_field_is_divergence_free_continuum():
    """vectorCurl is (0.1*dN/dy, -0.1*dN/dx) of a potential — its analytic
    divergence is ~0 (up to the reference's finite-difference eps)."""
    h = 1e-3
    xs = np.linspace(0.1, 0.9, 7)
    for x in xs:
        for y in xs:
            ux1, _ = vector_curl(x + h, y)
            ux0, _ = vector_curl(x - h, y)
            _, vy1 = vector_curl(x, y + h)
            _, vy0 = vector_curl(x, y - h)
            div = (ux1 - ux0) / (2 * h) + (vy1 - vy0) / (2 * h)
            assert abs(div) < 0.5  # peaks' scale is O(10); fd eps dominates


def test_reset_deterministic():
    p1, v1, u1, vv1 = reset(CFG)
    p2, v2, u2, vv2 = reset(CFG)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(u1, u2)
    assert p1.shape == (CFG.num_particles, 2)


def test_oracle_runs_and_is_stable():
    ref = FluidSimRef(CFG)
    for _ in range(3):
        ref.simulate(0.01)
    assert np.isfinite(ref.pos).all() and np.isfinite(ref.vel).all()
    assert np.abs(ref.vel).max() < 100.0


def test_step2d_matches_oracle():
    ref = FluidSimRef(CFG)
    state = SimState2D(
        pos=ref.pos.copy(), vel=ref.vel.copy(),
        u=ref.u.copy(), v=ref.v.copy(),
        phi=np.full((CFG.nx, CFG.ny), np.inf, np.float32),
    )
    ref.simulate(0.01)
    out = step2d_jit(state, 0.01, CFG)
    np.testing.assert_allclose(np.asarray(out.pos), ref.pos, atol=2e-5)
    dv = np.abs(np.asarray(out.vel) - ref.vel)
    assert np.quantile(dv, 0.5) < 1e-3, np.quantile(dv, [0.5, 0.95, 1.0])
    assert np.quantile(dv, 0.95) < 2e-2
    assert dv.max() < 0.5


def test_step2d_multi_step_stable():
    state = init_state2d(CFG)
    for _ in range(10):
        state = step2d_jit(state, 0.01, CFG)
    for name in ("pos", "vel", "u", "v", "phi"):
        assert np.isfinite(np.asarray(getattr(state, name))).all(), name
    m = np.array([CFG.nx, CFG.ny], np.float32)
    pos = np.asarray(state.pos)
    assert (pos >= -0.4 / m - 1e-6).all() and (pos <= 1 - 0.6 / m + 1e-6).all()
