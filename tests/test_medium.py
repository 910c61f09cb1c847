"""Volumetric medium tests (reference ``medium/medium_test.rs`` plus
HG-phase distribution checks in the style of ``bxdf/sampling_tests.rs``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength
from lumo_tpu.scene import trace
from lumo_tpu.scene.cornell import cornell_box
from lumo_tpu.scene.materials import Material, pack_materials


def _medium_scene(absorption, scattering, g):
    sb = cornell_box()
    sb.set_medium(absorption, scattering, g)
    return sb.build()


def _vol_mp(g, lam):
    table = {k: jnp.asarray(v) for k, v in pack_materials(
        [Material.volumetric(g, 1.0, [0.7, 0.7, 0.7], [0.4, 0.4, 0.4])]).items()}
    ids = jnp.zeros(lam.shape[0], jnp.int32)
    return bsdf.gather_params(table, ids, lam, None)


def test_zero_medium_has_no_effect():
    """reference ``medium_test.rs:5-25``."""
    scene = _medium_scene([0.0] * 3, [0.0] * 3, 0.0)
    key = jax.random.PRNGKey(1)
    n = 512
    lam = wavelength.sample(jax.random.uniform(key, (n,)))
    tr = trace.transmittance(scene, lam, jnp.full((n,), 100.0))
    assert float(jnp.abs(tr - 1.0).max()) < 2e-2
    o = jnp.tile(jnp.array([278.0, 273.0, -500.0]), (n, 1))
    d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
    hit = trace.intersect(scene, o, d, key=key)
    assert not bool(hit["is_medium"].any())


def test_medium_gets_hit():
    """reference ``medium_test.rs:27-38``: dense medium produces
    scattering events before the far wall."""
    scene = _medium_scene([0.5] * 3, [0.5] * 3, 0.0)
    key = jax.random.PRNGKey(2)
    n = 2048
    # from inside the box (medium events outside the scene bounds are
    # rejected, reference ``scene.rs:125-127``)
    o = jnp.tile(jnp.array([278.0, 273.0, 10.0]), (n, 1))
    d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
    hit = trace.intersect(scene, o, d, key=key)
    frac = float(hit["is_medium"].mean())
    assert frac > 0.4, frac
    # medium hits look like the reference pseudo-hit: Z normals, no light
    m = hit["is_medium"]
    assert bool((hit["light"][m] == -1).all())
    assert float(jnp.abs(hit["ns"][m][:, 2] - 1.0).max()) < 1e-6


@pytest.mark.parametrize("g", [-0.5, 0.0, 0.35, 0.8])
def test_hg_pdf_integrates_to_one(g):
    """∫ p_HG dΩ = 1 over the sphere (reference ``volumetric.rs:48-63``)."""
    n_t, n_p = 256, 512
    theta = (jnp.arange(n_t) + 0.5) / n_t * jnp.pi
    phi = (jnp.arange(n_p) + 0.5) / n_p * 2.0 * jnp.pi
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    wi = jnp.stack([jnp.sin(tt) * jnp.cos(pp), jnp.sin(tt) * jnp.sin(pp),
                    jnp.cos(tt)], -1).reshape(-1, 3)
    N = wi.shape[0]
    lam = wavelength.sample(jnp.full((N,), 0.4))
    mp = _vol_mp(g, lam)
    wo = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1))
    ns = wo
    p = bsdf.pdf(mp, wo, wi, ns, ns, lam)
    dw = jnp.sin(tt).reshape(-1) * (jnp.pi / n_t) * (2.0 * jnp.pi / n_p)
    integral = float(jnp.sum(p * dw))
    assert abs(integral - 1.0) < 1e-3, integral


@pytest.mark.parametrize("g", [-0.4, 0.0, 0.6])
def test_hg_sampling_matches_pdf(g):
    """1/pdf bin convergence over cosθ bins: each bin's Σ 1/pdf / N must
    approach its solid angle (reference ``sampling_tests.rs:80-133``)."""
    n = 200_000
    key = jax.random.PRNGKey(7)
    lam = wavelength.sample(jax.random.uniform(key, (n,)))
    mp = _vol_mp(g, lam)
    wo = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
    u_lobe = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    u_sq = jax.random.uniform(jax.random.fold_in(key, 2), (n, 2))
    wi, ok, _ = bsdf.sample(mp, wo, wo, jnp.zeros(n, bool), lam, u_lobe, u_sq)
    assert bool(ok.all())
    p = bsdf.pdf(mp, wo, wi, wo, wo, lam)
    nb = 10
    ct = jnp.clip(wi[:, 2], -1.0, 1.0 - 1e-7)
    bins = ((ct + 1.0) * 0.5 * nb).astype(jnp.int32)
    inv_p = 1.0 / jnp.maximum(p, 1e-30)
    est = jnp.zeros(nb).at[bins].add(inv_p) / n
    expected = 2.0 * jnp.pi * 2.0 / nb  # each cosθ slab: 2π·Δcosθ
    rel = np.abs(np.asarray(est) / expected - 1.0)
    assert rel.max() < 0.05, rel


def test_medium_renders_finite_and_scatters():
    from lumo_tpu.integrators import path_trace
    scene = _medium_scene([0.05] * 3, [0.3] * 3, 0.3)
    cam = cornell_camera(resolution=(16, 16))
    key = jax.random.PRNGKey(3)
    n = 512
    raster = jax.random.uniform(key, (n, 2)) * 16.0
    o, d = cam.generate_ray(raster, jnp.full((n, 2), 0.5))
    lam = wavelength.sample(jax.random.uniform(jax.random.fold_in(key, 1), (n,)))
    r, _, _ = jax.jit(lambda o, d, l, k: path_trace.integrate(
        scene, o, d, l, k, fixed_depth=6))(o, d, lam, key)
    assert bool(jnp.isfinite(r).all())
    assert float(r.mean()) > 0.0


def test_absorbing_medium_darkens():
    """Pure absorption must reduce wall radiance: medium events absorb
    camera paths (σs = 0 → f = 0) and stochastically block shadow rays."""
    from lumo_tpu.integrators import path_trace
    key = jax.random.PRNGKey(4)
    n = 2048
    # from just inside the open front, looking at the back wall: the
    # camera segment (~550 units) and the shadow segment both attenuate
    o = jnp.tile(jnp.array([278.0, 273.0, 5.0]), (n, 1))
    d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
    lam = wavelength.sample(jax.random.uniform(jax.random.fold_in(key, 1), (n,)))

    def render(scene):
        r, lo, _ = jax.jit(lambda o, d, l, k: path_trace.integrate(
            scene, o, d, l, k, fixed_depth=3))(o, d, lam, key)
        return float(r.mean())

    base = render(cornell_box().build())
    dark = render(_medium_scene([0.6] * 3, [0.0] * 3, 0.0))
    assert dark < 0.75 * base, (dark, base)
