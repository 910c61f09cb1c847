"""Device-side BVH / kd-tree traversal over ray wavefronts.

TPU re-design of the reference's iterative 64-deep-stack walks
(``src/tracer/object/bvh.rs:315-362``, ``kdtree.rs:101-169``): N rays
traverse in lockstep inside one ``lax.while_loop`` — each iteration every
live lane pops one node, slab-tests it, and either tests its leaf
triangles (Woop watertight, ``triangle.rs:63-187``) or pushes children
near-first.  All branches are masks; the loop runs until every lane's
stack is empty.

TPU-specific data layout (measured via XLA cost analysis):
- node tables are stored column-wise as 1-D arrays (lo_x, lo_y, …) —
  XLA's TPU gather lowering for (M, C) tables with per-lane indices
  expands to ~1000x the useful traffic, while (M,) gathers with (N,)
  indices are cheap;
- per-lane stack reads/writes use iota-mask selects over the (N, 64)
  stack instead of vmapped dynamic scatters — pure elementwise VPU work;
- leaf triangle gathers flatten their (N, LEAF) index blocks to 1-D.

Any-hit (shadow) traversal is the same loop with an early-exit mask
(reference ``GEO=false`` fast path, ``bvh.rs:330-338``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lumo_tpu.config import INF
from lumo_tpu.geometry import intersect as geo

STACK = 64  # reference ``bvh.rs:324``
LEAF = 4

_SLOTS = None


def _slots():
    return jnp.arange(STACK, dtype=jnp.int32)


def _put(st, pos, val, m):
    """st (N, STACK); write val (N,) at per-lane slot pos where m."""
    sel = (_slots()[None, :] == pos[:, None]) & m[:, None]
    return jnp.where(sel, val[:, None].astype(st.dtype), st)


def _take(st, pos):
    """st (N, STACK) → (N,) value at per-lane slot pos."""
    sel = _slots()[None, :] == pos[:, None]
    return jnp.sum(jnp.where(sel, st, jnp.zeros((), st.dtype)), axis=1)


def _columns3(v):
    """(M, 3) → three (M,) column arrays."""
    v = jnp.asarray(v)
    return v[:, 0], v[:, 1], v[:, 2]


def _gather_tri(cols, idx):
    """Gather triangle vertices by flat index: cols = 9 × (T,) columns,
    idx (N, LEAF) → a, b, c as (N, LEAF, 3)."""
    flat = idx.reshape(-1)
    g = [c[flat].reshape(idx.shape) for c in cols]
    a = jnp.stack(g[0:3], axis=-1)
    b = jnp.stack(g[3:6], axis=-1)
    c = jnp.stack(g[6:9], axis=-1)
    return a, b, c


def _tri_cols(tri):
    a, b, c = (jnp.asarray(x) for x in tri)
    return (a[:, 0], a[:, 1], a[:, 2], b[:, 0], b[:, 1], b[:, 2],
            c[:, 0], c[:, 1], c[:, 2])


def _leaf_t(o, kz, shear, tri_cols, first, count, t_min, t_max,
            prims=None):
    """Test the <=LEAF triangles of each lane's leaf.  With ``prims``,
    leaf slots index through the indirection list (kd-tree layout).
    Returns (t, idx): per-lane best hit among the leaf prims."""
    offs = jnp.arange(LEAF, dtype=jnp.int32)
    ref = first[:, None] + offs[None, :]                     # (N, LEAF)
    valid = offs[None, :] < count[:, None]
    if prims is not None:
        ref_c = jnp.clip(ref, 0, prims.shape[0] - 1)
        idx = prims[ref_c.reshape(-1)].reshape(ref.shape)
    else:
        idx = jnp.clip(ref, 0, tri_cols[0].shape[0] - 1)
    a, b, c = _gather_tri(tri_cols, idx)
    if t_max.ndim == 1:
        t_max = t_max[:, None]
    t, _, _ = geo.triangle_t(o, kz, shear, a, b, c, t_min, t_max)
    t = jnp.where(valid, t, INF)
    j = jnp.argmin(t, axis=-1)
    tb = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
    ib = jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0]
    return tb, ib


def _node_cols(bvh):
    lox, loy, loz = _columns3(bvh["lo"])
    hix, hiy, hiz = _columns3(bvh["hi"])
    return lox, loy, loz, hix, hiy, hiz


def _slab(nc, node, o, inv_d, scale=1.00000024):
    """Slab test of per-lane nodes against per-lane rays, column-wise."""
    lox, loy, loz, hix, hiy, hiz = nc
    t0x = (lox[node] - o[:, 0]) * inv_d[:, 0]
    t1x = (hix[node] - o[:, 0]) * inv_d[:, 0]
    t0y = (loy[node] - o[:, 1]) * inv_d[:, 1]
    t1y = (hiy[node] - o[:, 1]) * inv_d[:, 1]
    t0z = (loz[node] - o[:, 2]) * inv_d[:, 2]
    t1z = (hiz[node] - o[:, 2]) * inv_d[:, 2]
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z)) * scale
    return t_near, t_far


def closest_hit(bvh, tri, o, d, t_min=0.0, t_max=INF):
    """Closest-hit traversal.  bvh: dict of node arrays; tri: (a, b, c)
    triangle vertex arrays in BVH order.  o, d: (N, 3).
    Returns (t (N,), prim (N,)) — prim indexes the permuted arrays, -1 on
    miss."""
    N = o.shape[0]
    kz, shear = geo.ray_setup(d)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30, jnp.where(d < 0, -1e-30, 1e-30), d)
    neg = (d < 0.0)  # (N, 3) per-axis near/far child order

    if isinstance(t_max, (int, float)):
        t_max = jnp.full((N,), t_max, o.dtype)

    state = {
        "stack": jnp.zeros((N, STACK), jnp.int32),
        "sp": jnp.ones((N,), jnp.int32),        # root pre-pushed at slot 0
        "t": t_max,
        "prim": jnp.full((N,), -1, jnp.int32),
    }

    nc = _node_cols(bvh)
    node_right, node_first = bvh["right"], bvh["first"]
    node_count, node_axis = bvh["count"], bvh["axis"]
    tcols = _tri_cols(tri)

    def cond(s):
        return jnp.any(s["sp"] > 0)

    def body(s):
        active = s["sp"] > 0
        sp1 = jnp.maximum(s["sp"] - 1, 0)
        node = jnp.where(active, _take(s["stack"], sp1), 0)

        t_near, t_far = _slab(nc, node, o, inv_d)
        hit_box = active & (t_near <= t_far) & (t_far > t_min) & (t_near < s["t"])

        count = node_count[node]
        is_leaf = count > 0
        do_leaf = hit_box & is_leaf

        # leaf: test up to LEAF triangles
        lt, lidx = _leaf_t(o, kz, shear, tcols, node_first[node], count,
                           t_min, s["t"])
        better = do_leaf & (lt < s["t"])
        t_new = jnp.where(better, lt, s["t"])
        prim_new = jnp.where(better, lidx, s["prim"])

        # interior: replace popped slot with far child, push near child
        do_push = hit_box & ~is_leaf
        axis = node_axis[node]
        neg_ax = jnp.where(axis == 0, neg[:, 0],
                           jnp.where(axis == 1, neg[:, 1], neg[:, 2]))
        left = node + 1
        right = node_right[node]
        near = jnp.where(neg_ax, right, left)
        far = jnp.where(neg_ax, left, right)

        stack = _put(s["stack"], sp1, far, do_push)
        stack = _put(stack, jnp.minimum(sp1 + 1, STACK - 1), near, do_push)
        sp = jnp.where(do_push, jnp.minimum(sp1 + 2, STACK), sp1)

        return {"stack": stack, "sp": sp, "t": t_new, "prim": prim_new}

    out = jax.lax.while_loop(cond, body, state)
    miss = out["prim"] < 0
    return jnp.where(miss, INF, out["t"]), out["prim"]


def any_hit(bvh, tri, o, d, t_min=0.0, t_max=INF):
    """Occlusion traversal: True where any triangle lies in (t_min, t_max).
    Lanes stop traversing the moment they find a hit."""
    N = o.shape[0]
    kz, shear = geo.ray_setup(d)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30, jnp.where(d < 0, -1e-30, 1e-30), d)

    if isinstance(t_max, (int, float)):
        t_max = jnp.full((N,), t_max, o.dtype)

    state = {
        "stack": jnp.zeros((N, STACK), jnp.int32),
        "sp": jnp.ones((N,), jnp.int32),
        "hit": jnp.zeros((N,), bool),
    }

    nc = _node_cols(bvh)
    node_right, node_first = bvh["right"], bvh["first"]
    node_count = bvh["count"]
    tcols = _tri_cols(tri)

    def cond(s):
        return jnp.any((s["sp"] > 0) & ~s["hit"])

    def body(s):
        active = (s["sp"] > 0) & ~s["hit"]
        sp1 = jnp.where(active, s["sp"] - 1, s["sp"])
        slot = jnp.maximum(sp1, 0)
        node = jnp.where(active, _take(s["stack"], slot), 0)

        t_near, t_far = _slab(nc, node, o, inv_d)
        hit_box = active & (t_near <= t_far) & (t_far > t_min) & (t_near < t_max)

        count = node_count[node]
        is_leaf = count > 0
        lt, _ = _leaf_t(o, kz, shear, tcols, node_first[node], count,
                        t_min, t_max)
        hit = s["hit"] | (hit_box & is_leaf & (lt < t_max))

        do_push = hit_box & ~is_leaf
        left = node + 1
        right = node_right[node]
        stack = _put(s["stack"], slot, right, do_push)
        stack = _put(stack, jnp.minimum(slot + 1, STACK - 1), left, do_push)
        sp = jnp.where(do_push, jnp.minimum(slot + 2, STACK), sp1)

        return {"stack": stack, "sp": sp, "hit": hit}

    out = jax.lax.while_loop(cond, body, state)
    return out["hit"]


# ---------------------------------------------------------------------------
# kd-tree

def _kd_entry(kd, o, inv_d, t_min, t_max):
    """Slab-test the kd root bounds: per-lane (t0, t1) entry interval."""
    t0 = (kd["lo"][None, :] - o) * inv_d
    t1 = (kd["hi"][None, :] - o) * inv_d
    lo_t = jnp.max(jnp.minimum(t0, t1), axis=-1)
    hi_t = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.00000024
    e0 = jnp.maximum(lo_t, t_min)
    e1 = jnp.minimum(hi_t, t_max)
    return e0, e1, e0 <= e1


def _axis_pick(v, ax):
    """v (N, 3), ax (N,) in {0,1,2} → v[:, ax] per lane, column-wise."""
    return jnp.where(ax == 0, v[:, 0], jnp.where(ax == 1, v[:, 1], v[:, 2]))


def _kd_walk(kd, tri, o, d, t_min, t_max, any_hit_mode):
    """Shared kd traversal (reference ``kdtree.rs:101-169``): per-lane
    (node, t0, t1) stack, near child first; closest-hit mode keeps the
    ordered-traversal prune (skip cells past the best hit), any-hit mode
    stops a lane at its first hit in range."""
    N = o.shape[0]
    tri = tuple(jnp.asarray(x) for x in tri)
    kz, shear = geo.ray_setup(d)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                            jnp.where(d < 0, -1e-30, 1e-30), d)
    if isinstance(t_max, (int, float)):
        t_max = jnp.full((N,), t_max, o.dtype)
    t_lo = jnp.asarray(t_min, o.dtype)

    e0, e1, enter = _kd_entry(kd, o, inv_d, t_lo, t_max)
    state = {
        "stack_n": jnp.zeros((N, STACK), jnp.int32),
        "stack_t0": jnp.zeros((N, STACK), o.dtype).at[:, 0].set(e0),
        "stack_t1": jnp.zeros((N, STACK), o.dtype).at[:, 0].set(e1),
        "sp": jnp.where(enter, 1, 0).astype(jnp.int32),
        "t": t_max,
        "prim": jnp.full((N,), -1, jnp.int32),
        "lfirst": jnp.zeros((N,), jnp.int32),
        "lcount": jnp.zeros((N,), jnp.int32),
    }
    nd_split, nd_axis = kd["split"], kd["axis"]
    nd_right, nd_first, nd_count = kd["right"], kd["first"], kd["count"]
    prims = kd["prims"]
    tcols = _tri_cols(tri)

    def live(s):
        if any_hit_mode:
            return s["prim"] < 0
        return jnp.ones((N,), bool)

    def cond(s):
        return jnp.any(live(s) & ((s["sp"] > 0) | (s["lcount"] > 0)))

    def body(s):
        lv = live(s)
        in_leaf = lv & (s["lcount"] > 0)
        # --- leaf lanes: test one chunk of LEAF prims ---
        lt, lidx = _leaf_t(o, kz, shear, tcols, s["lfirst"], s["lcount"],
                           t_lo, s["t"], prims=prims)
        better = in_leaf & (lt < s["t"])
        t_new = jnp.where(better, lt, s["t"])
        prim_new = jnp.where(better, lidx, s["prim"])
        lfirst = jnp.where(in_leaf, s["lfirst"] + LEAF, s["lfirst"])
        lcount = jnp.where(in_leaf, jnp.maximum(s["lcount"] - LEAF, 0),
                           s["lcount"])

        # --- pop lanes ---
        can_pop = lv & ~in_leaf & (s["sp"] > 0)
        sp1 = jnp.where(can_pop, s["sp"] - 1, s["sp"])
        slot = jnp.maximum(sp1, 0)
        node = jnp.where(can_pop, _take(s["stack_n"], slot), 0)
        t0 = _take(s["stack_t0"], slot)
        t1 = _take(s["stack_t1"], slot)
        # ordered-traversal early exit: a popped cell starting beyond the
        # current best hit cannot contain a closer one
        active = can_pop & (t0 <= t_new)

        ax = nd_axis[node]
        is_leaf = active & (ax == 3)
        lfirst = jnp.where(is_leaf, nd_first[node], lfirst)
        lcount = jnp.where(is_leaf, nd_count[node], lcount)

        interior = active & (ax != 3)
        axc = jnp.clip(ax, 0, 2)
        o_a = _axis_pick(o, axc)
        d_a = _axis_pick(d, axc)
        inv_a = _axis_pick(inv_d, axc)
        split = nd_split[node]
        tplane = (split - o_a) * inv_a
        below = (o_a < split) | ((o_a == split) & (d_a <= 0))
        left = node + 1
        right = nd_right[node]
        near = jnp.where(below, left, right)
        far = jnp.where(below, right, left)
        # PBR fig 4.19 cases; a ray lying exactly in the split plane
        # (d_axis == 0 and o_axis == split) must visit both children over
        # the full interval.  inv_d is clamped to ±1e30 so tplane itself
        # never NaNs — test the degenerate case explicitly (the
        # reference's NaN comparisons fall through to visit-both here).
        nan_p = (d_a == 0.0) & (o_a == split)
        only_near = (tplane > t1) | (tplane <= 0)
        only_far = ~only_near & (tplane < t0)
        both = (~only_near & ~only_far) | nan_p
        t_mid_far = jnp.where(nan_p, t0, tplane)
        t_mid_near = jnp.where(nan_p, t1, tplane)

        # push: replace the popped slot; when both, far goes under near
        stack_n, stack_t0, stack_t1 = s["stack_n"], s["stack_t0"], s["stack_t1"]
        push1 = interior & (only_near | only_far | both)
        first_n = jnp.where(both | only_far, far, near)
        first_t0 = jnp.where(both, t_mid_far, t0)
        stack_n = _put(stack_n, slot, first_n, push1)
        stack_t0 = _put(stack_t0, slot, first_t0, push1)
        stack_t1 = _put(stack_t1, slot, t1, push1)
        push2 = interior & both
        slot2 = jnp.minimum(slot + 1, STACK - 1)
        stack_n = _put(stack_n, slot2, near, push2)
        stack_t0 = _put(stack_t0, slot2, t0, push2)
        stack_t1 = _put(stack_t1, slot2, t_mid_near, push2)
        sp = jnp.where(push2, jnp.minimum(slot + 2, STACK),
                       jnp.where(push1, slot + 1, sp1))

        return {"stack_n": stack_n, "stack_t0": stack_t0,
                "stack_t1": stack_t1, "sp": sp, "t": t_new,
                "prim": prim_new, "lfirst": lfirst, "lcount": lcount}

    out = jax.lax.while_loop(cond, body, state)
    miss = out["prim"] < 0
    return jnp.where(miss, INF, out["t"]), out["prim"]


def kd_closest_hit(kd, tri, o, d, t_min=0.0, t_max=INF):
    """Closest-hit kd-tree traversal.  Returns (t (N,), prim (N,)) with
    prim = -1 on miss."""
    return _kd_walk(kd, tri, o, d, t_min, t_max, any_hit_mode=False)


def kd_any_hit(kd, tri, o, d, t_min=0.0, t_max=INF):
    """Occlusion kd traversal: True where any prim lies in (t_min, t_max);
    lanes stop the moment they find a hit (any hit in range is kept as
    `prim`, so the walk ends for that lane)."""
    t, prim = _kd_walk(kd, tri, o, d, t_min, t_max, any_hit_mode=True)
    return prim >= 0