"""Renderer tests: component checks + an end-to-end frame smoke test."""

import numpy as np

import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.solver.step3d import step_jit

CFG = SimConfig(nx=16, ny=16, nz=16, cells_per_meter=16.0)


def test_sample_phi_matches_manual_trilerp():
    rng = np.random.default_rng(0)
    phi = rng.normal(size=(8, 8, 8)).astype(np.float32)
    # At texel centers the sample equals the texel value.
    for idx in [(0, 0, 0), (3, 4, 5), (7, 7, 7)]:
        p = (np.array(idx, np.float32) + 0.5) / 8.0
        got = float(rt.sample_phi(jnp.asarray(phi), jnp.asarray(p)))
        assert abs(got - phi[idx]) < 1e-6
    # Midway between two texels along x: mean of the two.
    p = np.array([(1.0 + 0.5 + 0.5) / 8.0, 0.5 / 8, 0.5 / 8], np.float32)
    got = float(rt.sample_phi(jnp.asarray(phi), jnp.asarray(p)))
    assert abs(got - 0.5 * (phi[1, 0, 0] + phi[2, 0, 0])) < 1e-6


def test_packed_phi_matches_sample_phi():
    rng = np.random.default_rng(2)
    phi = rng.normal(size=(16, 16, 16)).astype(np.float32)
    pts = rng.uniform(-0.2, 1.2, size=(4096, 3)).astype(np.float32)
    tex = rt.PackedPhi(jnp.asarray(phi))
    a = np.asarray(rt.sample_phi(jnp.asarray(phi), jnp.asarray(pts)))
    b = np.asarray(rt.sample_phi_packed(tex, jnp.asarray(pts)))
    np.testing.assert_allclose(a, b, atol=3e-6)
    c = np.asarray(rt.map_dist(jnp.asarray(phi), jnp.asarray(pts)))
    d = np.asarray(rt.map_dist_packed(tex, jnp.asarray(pts)))
    np.testing.assert_allclose(c, d, atol=3e-6)


def test_intersect_aabb():
    co = jnp.array([[0.0, 0.0, -3.0]])
    ci = jnp.array([[0.0, 0.0, 1.0]])
    lo = jnp.array([-0.5, -0.5, -0.5])
    hi = jnp.array([0.5, 0.5, 0.5])
    tm, tM, n1, n2 = rt.intersect_aabb(co, ci, lo, hi)
    assert abs(float(tm[0]) - 2.5) < 1e-5
    assert abs(float(tM[0]) - 3.5) < 1e-5
    np.testing.assert_allclose(np.asarray(n1[0]), [0, 0, -1], atol=1e-5)
    # Miss
    co2 = jnp.array([[5.0, 5.0, -3.0]])
    tm2, *_ = rt.intersect_aabb(co2, ci, lo, hi)
    assert float(tm2[0]) >= rt.LARGE


def test_fresnel_energy_and_tir():
    ci = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    f, refl, trans = rt.fresnel_tr(ci, n, 1.0, 1.333)
    # Normal incidence Schlick: ((n2-n1)/(n2+n1))^2
    assert abs(float(f[0]) - ((0.333 / 2.333) ** 2)) < 1e-6
    np.testing.assert_allclose(np.asarray(refl[0]), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans[0]), [0, -1, 0], atol=1e-6)
    # TIR: grazing from dense to light.
    ci2 = jnp.array([[0.999, -0.04, 0.0]])
    ci2 = ci2 / jnp.linalg.norm(ci2)
    f2, _, t2 = rt.fresnel_tr(ci2, n, 1.333, 1.0)
    assert float(f2[0]) == 1.0
    np.testing.assert_allclose(np.asarray(t2[0]), [0, 0, 0], atol=1e-6)


def test_environment_finite_and_positive():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    col = np.asarray(rt.sample_environment(jnp.asarray(d)))
    assert np.isfinite(col).all()
    assert (col >= 0).all()


def test_render_frame_smoke():
    """End-to-end: step the dam break once, render a small frame
    (BASELINE.json config 5)."""
    state = init_state(CFG)
    state = step_jit(state, 0.01, CFG)
    cam = OrbitCamera()
    co, right, up, fwd = cam.frame(80, 60)
    img = np.asarray(
        rt.render(state.phi, co, right, up, fwd, width=80, height=60)
    )
    assert img.shape == (60, 80, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # something visible
    # Sky pixels at the top should dominate the glass region brightness-wise;
    # just require spatial variation (not a constant field).
    assert img.std() > 0.01
