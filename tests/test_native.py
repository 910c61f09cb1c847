"""Native C++ BVH builder: parity with the numpy builder + tree validity.

The native builder (``lumo_tpu/native/bvh_builder.cpp``) implements the
same binned SAH as ``lumo_tpu.accel.build`` (reference heuristics from
``src/tracer/object/bvh/node.rs:4-6``); both must produce structurally
valid trees that traversal finds identical hits through.
"""
import numpy as np
import pytest

from lumo_tpu import native
from lumo_tpu.accel import build as B


def _soup(P, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, (P, 3))
    b = a + rng.uniform(-0.05, 0.05, (P, 3))
    c = a + rng.uniform(-0.05, 0.05, (P, 3))
    return a, b, c


def _validate(bvh, lo, hi):
    P = len(lo)
    M = len(bvh.node_lo)
    seen = np.zeros(P, bool)
    stack = [0]
    while stack:
        n = stack.pop()
        cnt = bvh.node_count[n]
        if cnt > 0:
            f = bvh.node_first[n]
            ids = bvh.order[f:f + cnt]
            assert not seen[ids].any(), "prim emitted twice"
            seen[ids] = True
            assert (bvh.node_lo[n][None] <= lo[ids] + 1e-4).all()
            assert (bvh.node_hi[n][None] >= hi[ids] - 1e-4).all()
        else:
            l, r = n + 1, bvh.node_right[n]
            assert 0 < r < M
            for ch in (l, r):
                assert (bvh.node_lo[n] <= bvh.node_lo[ch] + 1e-4).all()
                assert (bvh.node_hi[n] >= bvh.node_hi[ch] - 1e-4).all()
            stack += [l, r]
    assert seen.all(), "some prims missing from leaves"


def test_native_builds_valid_tree():
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    a, b, c = _soup(20000)
    lo, hi = B.triangle_bounds(a, b, c)
    bvh = B.build(lo, hi, use_native=True)
    _validate(bvh, lo, hi)


def test_native_matches_numpy_traversal():
    """Both trees must return the same closest hits for random rays."""
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    import jax.numpy as jnp
    from lumo_tpu.accel import traverse

    a, b, c = _soup(5000, seed=1)
    lo, hi = B.triangle_bounds(a, b, c)
    rng = np.random.default_rng(2)
    o = rng.uniform(-2, 2, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    ts = []
    for use_native in (True, False):
        bvh = B.build(lo, hi, use_native=use_native)
        nodes = {"lo": jnp.asarray(bvh.node_lo), "hi": jnp.asarray(bvh.node_hi),
                 "right": jnp.asarray(bvh.node_right),
                 "first": jnp.asarray(bvh.node_first),
                 "count": jnp.asarray(bvh.node_count),
                 "axis": jnp.asarray(bvh.node_axis)}
        tri = (jnp.asarray(a[bvh.order], jnp.float32),
               jnp.asarray(b[bvh.order], jnp.float32),
               jnp.asarray(c[bvh.order], jnp.float32))
        t, prim = traverse.closest_hit(nodes, tri, jnp.asarray(o), jnp.asarray(d))
        ts.append(np.asarray(t))
    np.testing.assert_allclose(ts[0], ts[1], rtol=1e-4, atol=1e-5)
