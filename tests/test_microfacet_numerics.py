"""Regression tests for the GGX numerics that broke the round-3
rough-dielectric χ² (``test_chi2[dielectric-0.5-1.5]``): a cap on the
exponent ``e = tan²θ(…)`` in ``d_ggx`` inflated D by ~300× for
horizon-grazing half-vectors, so the declared transmission pdf spiked
just below the horizon (reconstructed wh_z ≈ 1e-5 for grazing wo with
the dispersive glass eta) while the sampler density stayed correct.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.bsdf import microfacet as mf
from lumo_tpu.scene.materials import Material, pack_materials


def _d_ggx_reference(wh, ax, ay):
    """Textbook anisotropic GGX in f64 (no reductions)."""
    x, y, z = wh
    c2 = z * z
    if c2 <= 1e-12:
        return 0.0
    t2 = (x * x + y * y) / c2
    if t2 == 0.0:
        return 1.0 / (math.pi * ax * ay * c2 * c2)
    phi_cos2 = x * x / (x * x + y * y)
    phi_sin2 = y * y / (x * x + y * y)
    e = t2 * (phi_cos2 / (ax * ax) + phi_sin2 / (ay * ay))
    return 1.0 / (math.pi * ax * ay * c2 * c2 * (1.0 + e) ** 2)


def test_d_ggx_matches_reference_incl_horizon():
    rng = np.random.default_rng(0)
    # include horizon-grazing normals (the round-3 failure lived at
    # wh_z ~ 1e-5) and near-pole normals
    zs = np.concatenate([rng.uniform(-1, 1, 200),
                         rng.uniform(1e-6, 1e-4, 50),
                         1.0 - rng.uniform(0, 1e-6, 20)])
    phi = rng.uniform(0, 2 * np.pi, zs.shape[0])
    s = np.sqrt(np.maximum(1 - zs ** 2, 0))
    wh = np.stack([s * np.cos(phi), s * np.sin(phi), zs], -1)
    for ax, ay in [(0.5, 0.5), (0.1, 0.1), (0.5, 0.175), (1.0, 1.0)]:
        alpha = jnp.broadcast_to(jnp.asarray([ax, ay], jnp.float32),
                                 (wh.shape[0], 2))
        got = np.asarray(mf.d_ggx(jnp.asarray(wh, jnp.float32), alpha))
        want = np.array([_d_ggx_reference(w, ax, ay) for w in wh])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-8)


def test_lambda_ggx_grazing_not_capped():
    # Λ must keep growing ∝ tanθ at super-grazing angles; the old cap
    # froze it (z below 1e-6 hits the deliberate c² > 1e-12 in-plane
    # cutoff, so probe just above it)
    for z in (1e-5, 1e-4, 1e-2):
        w = jnp.asarray([[math.sqrt(1 - z * z), 0.0, z]], jnp.float32)
        alpha = jnp.asarray([[0.5, 0.5]], jnp.float32)
        lam = float(mf._lambda_ggx(w, alpha)[0])
        expect = (math.sqrt(1 + (0.5 / z) ** 2) - 1) / 2
        assert abs(lam - expect) / expect < 1e-3, (z, lam, expect)


def test_dielectric_pdf_no_horizon_spike():
    """The exact configuration from the round-3 χ² failure dump: pdf at
    the spiking Simpson node must be O(1), and the whole-sphere pdf
    integral must be ~<= 1 (it reached 2.9 with the capped D)."""
    mat = Material.microfacet(0.5, 1.5, 0.0, True, True,
                              (1, 1, 1), (1, 1, 1), (1, 1, 1))
    table = {k: jnp.asarray(v) for k, v in pack_materials([mat]).items()}
    wo = np.array([-0.74211484, 0.6563626, 0.13584471], np.float32)
    wo /= np.linalg.norm(wo)
    lam1 = jnp.asarray([580.66595, 674.65533, 438.23383, 515.72894],
                       jnp.float32)
    Z = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    th = math.radians(95.34375)
    ph = 5.558328252210691
    wi = np.array([math.sin(th) * math.cos(ph),
                   math.sin(th) * math.sin(ph), math.cos(th)], np.float32)
    mp = bsdf.gather_params(table, jnp.zeros((1,), jnp.int32), lam1[None],
                            None)
    p = float(bsdf.pdf(mp, jnp.asarray(wo)[None], jnp.asarray(wi)[None],
                       Z[None], Z[None], lam1[None])[0])
    assert p < 10.0, f"horizon spike back: pdf={p}"

    # whole-sphere integral via uniform-grid midpoint rule
    M = 256
    ths = (np.arange(M) + 0.5) * math.pi / M
    phs = (np.arange(2 * M) + 0.5) * 2 * math.pi / (2 * M)
    T, P = np.meshgrid(ths, phs, indexing="ij")
    wis = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                    np.cos(T)], -1).reshape(-1, 3).astype(np.float32)
    N = wis.shape[0]
    lam = jnp.broadcast_to(lam1, (N, 4))
    mpN = bsdf.gather_params(table, jnp.zeros((N,), jnp.int32), lam, None)
    ns = jnp.broadcast_to(Z, (N, 3))
    pv = np.asarray(bsdf.pdf(mpN, jnp.broadcast_to(jnp.asarray(wo), (N, 3)),
                             jnp.asarray(wis), ns, ns, lam))
    integral = float((pv.reshape(M, 2 * M) * np.sin(ths)[:, None]).sum()
                     * (math.pi / M) * (2 * math.pi / (2 * M)))
    assert integral < 1.02, f"pdf integrates to {integral}"
    assert integral > 0.5, f"pdf integrates to {integral}"
