"""Fused f_pdf must agree with the standalone f and pdf paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.color import wavelength
from lumo_tpu.scene.materials import Material, pack_materials


def _materials():
    rows = [
        Material.diffuse([0.7, 0.4, 0.2]),
        Material.lambertian([0.5, 0.5, 0.8]),
        Material.metal([0.9, 0.8, 0.6], 0.2, 1.5, 2.0),
        Material.mirror(),
        Material.glass(),
        Material.transparent([0.9, 0.9, 0.9], 0.4, 1.5),
    ]
    return {k: jnp.asarray(v) for k, v in pack_materials(rows).items()}, \
        list(range(len(rows)))


@pytest.mark.parametrize("mode", [0, 1])
def test_f_pdf_matches_separate(mode):
    materials, mids = _materials()
    key = jax.random.PRNGKey(3)
    N = 512
    k1, k2, k3 = jax.random.split(key, 3)
    mat = jnp.asarray(np.random.RandomState(0).choice(mids, N), jnp.int32)
    lam = wavelength.sample(jax.random.uniform(k1, (N,)))
    ns = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    ng = ns
    wo = jax.random.normal(k2, (N, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jax.random.normal(k3, (N, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    backface = jnp.zeros((N,), bool)

    mp = bsdf.gather_params(materials, mat, lam, jnp.zeros((N, 2)))
    f_fused, p_fused = bsdf.f_pdf(mp, wo, wi, ng, ns, backface, lam, mode)
    f_sep = bsdf.f(mp, wo, wi, ng, ns, backface, lam, mode)
    p_sep = bsdf.pdf(mp, wo, wi, ng, ns, lam)

    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_sep),
                               rtol=1e-5, atol=1e-6)
    # standalone pdf substitutes the z-axis half-vector only for eta==1
    # lanes; the fused path substitutes for all delta lanes — identical
    # outside a DELTA_EPS cone, so compare only non-delta lanes exactly
    nd = ~np.asarray(mp["is_delta"])
    np.testing.assert_allclose(np.asarray(p_fused)[nd], np.asarray(p_sep)[nd],
                               rtol=1e-5, atol=1e-6)
