"""Spectral core tests: hero wavelengths, dense spectra, uplift, colorspace.

Mirrors the reference's numerics tests (``spectrum/spectrum_tests.rs``,
``wavelength.rs`` invariants) with round-trip + Monte-Carlo checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.color import dense, space, uplift, wavelength


def test_wavelength_sample_in_range():
    u = jax.random.uniform(jax.random.PRNGKey(1), (10000,))
    lam = wavelength.sample(u)
    assert lam.shape == (10000, 4)
    assert float(lam.min()) >= 360.0 - 1e-3
    assert float(lam.max()) <= 830.0 + 1e-3


def test_wavelength_pdf_integrates_to_one():
    # MC integral of pdf over uniform lambda should be 1/range * range = 1
    lam = np.linspace(360.0, 830.0, 100001)
    p = np.asarray(wavelength.pdf_one(jnp.asarray(lam)))
    integral = np.trapezoid(p, lam)
    assert abs(integral - 1.0) < 1e-3


def test_wavelength_terminate():
    lam = wavelength.sample(jnp.array([0.3, 0.7]))
    lam_t = wavelength.terminate(lam, jnp.array([True, False]))
    assert bool(wavelength.is_terminated(lam_t)[0])
    assert not bool(wavelength.is_terminated(lam_t)[1])
    p = wavelength.pdf(lam_t)
    # leading pdf divided by 4 when terminated
    np.testing.assert_allclose(p[0, 0] * 4.0, wavelength.pdf_one(lam_t[0, 0]), rtol=1e-6)
    assert float(p[0, 1]) == 0.0


def test_dense_sample_interpolation():
    vals = jnp.asarray(dense.table("D65"))
    # exact grid point
    np.testing.assert_allclose(
        float(dense.sample(vals, jnp.asarray(360.0 + 5 * 10))), dense.table("D65")[10],
        rtol=1e-6)
    # midpoint
    mid = 0.5 * (dense.table("D65")[10] + dense.table("D65")[11])
    np.testing.assert_allclose(
        float(dense.sample(vals, jnp.asarray(360.0 + 5 * 10 + 2.5))), mid, rtol=1e-6)
    # terminated wavelength yields 0
    assert float(dense.sample(vals, jnp.asarray(0.0))) == 0.0


def test_dense_from_points_matches_reference_shape():
    ds = dense.from_points([400.0, 500.0], [1.0, 3.0])
    grid = 360.0 + 5.0 * np.arange(95)
    i450 = int((450 - 360) / 5)
    assert abs(ds[i450] - 2.0) < 1e-12
    # linear fall-off to zero beyond the range endpoints
    assert ds[0] == 0.0


def test_uplift_round_trip():
    rgbs = np.array([
        [1, 1, 1], [0.5, 0.2, 0.1], [0.1, 0.8, 0.3], [0.9, 0.9, 0.0],
        [0.05, 0.05, 0.05], [1, 0, 0], [0, 1, 0], [0, 0, 1], [0.2, 0.4, 0.9],
    ])
    co = uplift.from_rgb(rgbs)
    lam = 360.0 + 5.0 * np.arange(95)
    x = (lam - 360.0) / 470.0
    t = co[:, 0:1] * x * x + co[:, 1:2] * x + co[:, 2:3]
    vals = co[:, 3:4] * (0.5 + t / (2 * np.sqrt(1 + t * t)))
    A, _ = uplift._fit_basis()
    back = vals @ A.T
    assert np.abs(back - rgbs).max() < 5e-3


def test_uplift_black_and_hdr():
    assert np.all(uplift.from_rgb([0.0, 0.0, 0.0]) == 0.0)
    co = uplift.from_rgb([5.0, 3.0, 1.0])
    assert co[..., 3] == pytest.approx(10.0)  # scale = 2*max


def test_uplift_reflectance_bounded():
    # uplifted reflectances must stay in [0, ~1] for LDR inputs
    rng = np.random.default_rng(0)
    rgbs = rng.uniform(0.0, 1.0, (64, 3))
    co = uplift.from_rgb(rgbs)
    lam = np.linspace(360, 830, 200)
    x = (lam - 360.0) / 470.0
    t = co[:, 0:1] * x[None] ** 2 + co[:, 1:2] * x[None] + co[:, 2:3]
    vals = co[:, 3:4] * (0.5 + t / (2 * np.sqrt(1 + t * t)))
    assert vals.min() >= 0.0
    assert vals.max() <= 1.05


def test_mc_spectral_to_rgb_round_trip():
    """Full pipeline: uplift → hero sampling → radiance under D65 → XYZ →
    sRGB must reproduce the source RGB (the film's conversion path)."""
    key = jax.random.PRNGKey(0)
    lam = wavelength.sample(jax.random.uniform(key, (100_000,)))
    rgb_in = np.array([0.7, 0.2, 0.4])
    co = jnp.asarray(uplift.from_rgb(rgb_in))
    vals = uplift.sample(co, lam)
    d65 = jnp.asarray(dense.table("D65"))
    norm = float(np.dot(dense.table("D65"), dense.table("Y"))) * dense.STEP
    radiance = vals * dense.sample(d65, lam) * dense.Y_INTEGRAL / norm
    xyz = np.asarray(space.to_xyz(radiance, lam).mean(axis=0))
    rgb_out = space.get("sRGB").xyz_to_rgb @ xyz
    assert np.abs(rgb_out - rgb_in).max() < 0.01


def test_luminance_of_unit_spectrum():
    lam = wavelength.sample(jax.random.uniform(jax.random.PRNGKey(3), (50_000,)))
    ones = jnp.ones(lam.shape)
    mean_lum = float(space.luminance(ones, lam).mean())
    assert abs(mean_lum - 1.0) < 0.01


def test_colorspace_encode():
    cs = space.get("sRGB")
    img = cs.encode(np.array([[0.0, 1.0, 0.5]]))
    assert img.dtype == np.uint8
    assert img[0, 0] == 0 and img[0, 1] == 255
    # white balance of the native illuminant is ~identity
    wb = cs.wb_matrix(dense.table("D65"))
    np.testing.assert_allclose(wb, np.eye(3), atol=1e-3)
