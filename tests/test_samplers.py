"""Sampler property tests.

The CMJ shuffle (reference ``samplers.rs:137-189``, Kensler TM 13-01)
relies on ``_permute`` being a bijection of [0, l) — a non-bijective
fallback would silently bias the stratification (VERDICT r3 weak #7).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.sampling import samplers


@pytest.mark.parametrize("l", [1, 2, 3, 4, 7, 16, 100, 255, 256, 257, 1000])
@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF, 0x51633E2D])
def test_permute_is_bijective(l, seed):
    i = jnp.arange(l, dtype=jnp.uint32)
    out = np.asarray(samplers._permute(i, l, jnp.uint32(seed)))
    assert out.min() >= 0 and out.max() < l
    assert len(np.unique(out)) == l, f"not a bijection for l={l} p={seed:#x}"


def test_permute_differs_by_seed():
    l = 64
    i = jnp.arange(l, dtype=jnp.uint32)
    a = np.asarray(samplers._permute(i, l, jnp.uint32(1)))
    b = np.asarray(samplers._permute(i, l, jnp.uint32(2)))
    assert (a != b).any()


def test_cmj_stratified():
    """Every CMJ sample of an m×n pattern must land in its own cell of
    both the m×n grid and the N-column/N-row projections (the defining
    property of correlated multi-jittered points)."""
    m, n = 4, 4
    N = m * n
    s = jnp.arange(N, dtype=jnp.uint32)
    pts = np.asarray(samplers.cmj(s, m, n, jnp.uint32(123)))
    assert pts.shape == (N, 2)
    assert (pts >= 0).all() and (pts < 1).all()
    # m×n stratification: exactly one point per coarse cell
    cx = np.floor(pts[:, 0] * m).astype(int)
    cy = np.floor(pts[:, 1] * n).astype(int)
    cells = set(zip(cx.tolist(), cy.tolist()))
    assert len(cells) == N
    # N-way projections: one point per fine column and per fine row
    fx = np.floor(pts[:, 0] * N).astype(int)
    fy = np.floor(pts[:, 1] * N).astype(int)
    assert len(set(fx.tolist())) == N
    assert len(set(fy.tolist())) == N
