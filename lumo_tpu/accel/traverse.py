"""Device-side BVH traversal over ray wavefronts.

TPU re-design of the reference's iterative 64-deep-stack walk
(``src/tracer/object/bvh.rs:315-362``): N rays traverse in lockstep inside
one ``lax.while_loop`` — each iteration every live lane pops one node,
slab-tests it, and either tests its <=4-triangle leaf (Woop watertight,
``triangle.rs:63-187``) or pushes the two children near-first.  All
branches are masks; the loop runs until every lane's stack is empty.
Triangles are pre-permuted at build time so each leaf is a contiguous
slice — leaf tests are plain dynamic-slice gathers.

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


def _leaf_t(o, kz, shear, tri, first, count, t_min, t_max):
    """Test the <=LEAF triangles of each lane's leaf. Returns (t, idx):
    per-lane best hit among the leaf prims ((N,), (N,))."""
    a, b, c = tri
    offs = jnp.arange(LEAF, dtype=jnp.int32)
    idx = first[:, None] + offs[None, :]                     # (N, LEAF)
    valid = offs[None, :] < count[:, None]
    idx_c = jnp.clip(idx, 0, a.shape[0] - 1)
    if t_max.ndim == 1:
        t_max = t_max[:, None]
    t, _, _ = geo.triangle_t(o, kz, shear, a[idx_c], b[idx_c], c[idx_c],
                             t_min, t_max)
    t = jnp.where(valid, t, INF)
    j = jnp.argmin(t, axis=-1)
    tb = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
    ib = jnp.take_along_axis(idx_c, j[:, None], axis=-1)[:, 0]
    return tb, ib


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

    node_lo, node_hi = bvh["lo"], bvh["hi"]
    node_right, node_first = bvh["right"], bvh["first"]
    node_count, node_axis = bvh["count"], bvh["axis"]

    def cond(s):
        return jnp.any(s["sp"] > 0)

    def body(s):
        active = s["sp"] > 0
        sp1 = jnp.maximum(s["sp"] - 1, 0)
        node = jnp.take_along_axis(s["stack"], sp1[:, None], axis=1)[:, 0]
        node = jnp.where(active, node, 0)

        lo = node_lo[node]
        hi = node_hi[node]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.00000024
        hit_box = active & (t_near <= t_far) & (t_far > t_min) & (t_near < s["t"])

        count = node_count[node]
        is_leaf = count > 0
        do_leaf = hit_box & is_leaf

        # leaf: test up to LEAF triangles
        lt, lidx = _leaf_t(o, kz, shear, tri, node_first[node], count,
                           t_min, s["t"])
        better = do_leaf & (lt < s["t"])
        t_new = jnp.where(better, lt, s["t"])
        prim_new = jnp.where(better, lidx, s["prim"])

        # interior: replace popped slot with far child, push near child
        do_push = hit_box & ~is_leaf
        axis = node_axis[node]
        neg_ax = jnp.take_along_axis(neg, axis[:, None], axis=1)[:, 0]
        left = node + 1
        right = node_right[node]
        near = jnp.where(neg_ax, right, left)
        far = jnp.where(neg_ax, left, right)

        stack = s["stack"]
        put = lambda st, pos, val, m: jax.vmap(
            lambda row, p, v, mm: jnp.where(mm, row.at[p].set(v), row)
        )(st, pos, val, m)
        stack = put(stack, sp1, far, do_push)
        stack = put(stack, jnp.minimum(sp1 + 1, STACK - 1), near, do_push)
        sp = jnp.where(do_push, jnp.minimum(sp1 + 2, STACK), sp1)

        return {"stack": stack, "sp": sp, "t": t_new, "prim": prim_new}

    out = jax.lax.while_loop(cond, body, state)
    miss = out["prim"] < 0
    return jnp.where(miss, INF, out["t"]), out["prim"]


def _leaf_t_indirect(o, kz, shear, tri, prims, first, count, t_min, t_max):
    """Like ``_leaf_t`` but through the kd-tree's leaf→prim indirection
    list; tests one chunk of LEAF prims starting at ``first``.  Returns
    (t, prim_id) per lane."""
    a, b, c = tri
    offs = jnp.arange(LEAF, dtype=jnp.int32)
    ref = first[:, None] + offs[None, :]                     # (N, LEAF)
    valid = offs[None, :] < count[:, None]
    ref_c = jnp.clip(ref, 0, prims.shape[0] - 1)
    idx = prims[ref_c]
    if t_max.ndim == 1:
        t_max = t_max[:, None]
    t, _, _ = geo.triangle_t(o, kz, shear, a[idx], b[idx], c[idx],
                             t_min, t_max)
    t = jnp.where(valid, t, INF)
    j = jnp.argmin(t, axis=-1)
    tb = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
    ib = jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0]
    return tb, ib


def _kd_entry(kd, o, inv_d, t_min, t_max):
    """Slab-test the kd root bounds: per-lane (t0, t1) entry interval."""
    t0 = (kd["lo"][None, :] - o) * inv_d
    t1 = (kd["hi"][None, :] - o) * inv_d
    lo_t = jnp.max(jnp.minimum(t0, t1), axis=-1)
    hi_t = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.00000024
    e0 = jnp.maximum(lo_t, t_min)
    e1 = jnp.minimum(hi_t, t_max)
    return e0, e1, e0 <= e1


def kd_closest_hit(kd, tri, o, d, t_min=0.0, t_max=INF):
    """Closest-hit kd-tree traversal (reference ``kdtree.rs:101-169``):
    each lane walks with a (node, t_start, t_end) stack, near child
    first, and skips popped subtrees whose t_start exceeds the current
    best hit — the kd-tree's ordered-traversal early exit.  Leaves of any
    size are consumed LEAF prims per loop iteration via a per-lane leaf
    cursor.  Returns (t (N,), prim (N,)) with prim = -1 on miss."""
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

    def cond(s):
        return jnp.any((s["sp"] > 0) | (s["lcount"] > 0))

    def body(s):
        in_leaf = s["lcount"] > 0
        # --- leaf lanes: test one chunk of LEAF prims ---
        lt, lidx = _leaf_t_indirect(o, kz, shear, tri, prims,
                                    s["lfirst"], s["lcount"], t_lo, s["t"])
        better = in_leaf & (lt < s["t"])
        t_new = jnp.where(better, lt, s["t"])
        prim_new = jnp.where(better, lidx, s["prim"])
        lfirst = jnp.where(in_leaf, s["lfirst"] + LEAF, s["lfirst"])
        lcount = jnp.where(in_leaf, jnp.maximum(s["lcount"] - LEAF, 0),
                           s["lcount"])

        # --- pop lanes ---
        can_pop = ~in_leaf & (s["sp"] > 0)
        sp1 = jnp.where(can_pop, s["sp"] - 1, s["sp"])
        slot = jnp.maximum(sp1, 0)
        take = lambda st: jnp.take_along_axis(st, slot[:, None], axis=1)[:, 0]
        node = jnp.where(can_pop, take(s["stack_n"]), 0)
        t0 = take(s["stack_t0"])
        t1 = take(s["stack_t1"])
        # ordered-traversal early exit: a popped cell starting beyond the
        # current best hit cannot contain a closer one
        active = can_pop & (t0 <= t_new)

        ax = nd_axis[node]
        is_leaf = active & (ax == 3)
        lfirst = jnp.where(is_leaf, nd_first[node], lfirst)
        lcount = jnp.where(is_leaf, nd_count[node], lcount)

        interior = active & (ax != 3)
        axc = jnp.clip(ax, 0, 2)
        o_a = jnp.take_along_axis(o, axc[:, None], axis=1)[:, 0]
        d_a = jnp.take_along_axis(d, axc[:, None], axis=1)[:, 0]
        inv_a = jnp.take_along_axis(inv_d, axc[:, None], axis=1)[:, 0]
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
        # never NaNs — test the degenerate case explicitly (the reference's
        # NaN comparisons fall through to the visit-both branch here).
        nan_p = (d_a == 0.0) & (o_a == split)
        only_near = (tplane > t1) | (tplane <= 0)
        only_far = ~only_near & (tplane < t0)
        both = (~only_near & ~only_far) | nan_p
        t_mid_far = jnp.where(nan_p, t0, tplane)
        t_mid_near = jnp.where(nan_p, t1, tplane)

        # push: replace the popped slot; when both, far goes under near
        stack_n, stack_t0, stack_t1 = s["stack_n"], s["stack_t0"], s["stack_t1"]
        put = lambda st, pos, val, m: jax.vmap(
            lambda row, p, v, mm: jnp.where(mm, row.at[p].set(v), row)
        )(st, pos, val, m)
        push1 = interior & (only_near | only_far | both)
        first_n = jnp.where(both | only_far, far, near)
        first_t0 = jnp.where(both, t_mid_far, t0)
        stack_n = put(stack_n, slot, first_n, push1)
        stack_t0 = put(stack_t0, slot, first_t0, push1)
        stack_t1 = put(stack_t1, slot, t1, push1)
        push2 = interior & both
        slot2 = jnp.minimum(slot + 1, STACK - 1)
        stack_n = put(stack_n, slot2, near, push2)
        stack_t0 = put(stack_t0, slot2, t0, push2)
        stack_t1 = put(stack_t1, slot2, t_mid_near, push2)
        sp = jnp.where(push2, jnp.minimum(slot + 2, STACK),
                       jnp.where(push1, slot + 1, sp1))

        return {"stack_n": stack_n, "stack_t0": stack_t0,
                "stack_t1": stack_t1, "sp": sp, "t": t_new,
                "prim": prim_new, "lfirst": lfirst, "lcount": lcount}

    out = jax.lax.while_loop(cond, body, state)
    miss = out["prim"] < 0
    return jnp.where(miss, INF, out["t"]), out["prim"]


def kd_any_hit(kd, tri, o, d, t_min=0.0, t_max=INF):
    """Occlusion kd traversal: True where any prim lies in (t_min, t_max);
    lanes stop the moment they find a hit (reference ``GEO=false`` path,
    ``kdtree.rs:101-169``) — no ordered near-first bookkeeping, no
    closest-hit refinement."""
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
        "hit": jnp.zeros((N,), bool),
        "lfirst": jnp.zeros((N,), jnp.int32),
        "lcount": jnp.zeros((N,), jnp.int32),
    }
    nd_split, nd_axis = kd["split"], kd["axis"]
    nd_right, nd_first, nd_count = kd["right"], kd["first"], kd["count"]
    prims = kd["prims"]

    def cond(s):
        return jnp.any(~s["hit"] & ((s["sp"] > 0) | (s["lcount"] > 0)))

    def body(s):
        live = ~s["hit"]
        in_leaf = live & (s["lcount"] > 0)
        lt, _ = _leaf_t_indirect(o, kz, shear, tri, prims,
                                 s["lfirst"], s["lcount"], t_lo, t_max)
        hit = s["hit"] | (in_leaf & (lt < t_max))
        lfirst = jnp.where(in_leaf, s["lfirst"] + LEAF, s["lfirst"])
        lcount = jnp.where(in_leaf, jnp.maximum(s["lcount"] - LEAF, 0),
                           s["lcount"])

        can_pop = live & ~in_leaf & (s["sp"] > 0)
        sp1 = jnp.where(can_pop, s["sp"] - 1, s["sp"])
        slot = jnp.maximum(sp1, 0)
        take = lambda st: jnp.take_along_axis(st, slot[:, None], axis=1)[:, 0]
        node = jnp.where(can_pop, take(s["stack_n"]), 0)
        t0 = take(s["stack_t0"])
        t1 = take(s["stack_t1"])

        ax = nd_axis[node]
        is_leaf = can_pop & (ax == 3)
        lfirst = jnp.where(is_leaf, nd_first[node], lfirst)
        lcount = jnp.where(is_leaf, nd_count[node], lcount)

        interior = can_pop & (ax != 3)
        axc = jnp.clip(ax, 0, 2)
        o_a = jnp.take_along_axis(o, axc[:, None], axis=1)[:, 0]
        d_a = jnp.take_along_axis(d, axc[:, None], axis=1)[:, 0]
        inv_a = jnp.take_along_axis(inv_d, axc[:, None], axis=1)[:, 0]
        split = nd_split[node]
        tplane = (split - o_a) * inv_a
        below = (o_a < split) | ((o_a == split) & (d_a <= 0))
        left = node + 1
        right = nd_right[node]
        near = jnp.where(below, left, right)
        far = jnp.where(below, right, left)
        nan_p = (d_a == 0.0) & (o_a == split)   # in-plane-parallel: both
        only_near = (tplane > t1) | (tplane <= 0)
        only_far = ~only_near & (tplane < t0)
        both = (~only_near & ~only_far) | nan_p
        t_mid_far = jnp.where(nan_p, t0, tplane)
        t_mid_near = jnp.where(nan_p, t1, tplane)

        stack_n, stack_t0, stack_t1 = s["stack_n"], s["stack_t0"], s["stack_t1"]
        put = lambda st, pos, val, m: jax.vmap(
            lambda row, p, v, mm: jnp.where(mm, row.at[p].set(v), row)
        )(st, pos, val, m)
        push1 = interior & (only_near | only_far | both)
        first_n = jnp.where(both | only_far, far, near)
        first_t0 = jnp.where(both, t_mid_far, t0)
        stack_n = put(stack_n, slot, first_n, push1)
        stack_t0 = put(stack_t0, slot, first_t0, push1)
        stack_t1 = put(stack_t1, slot, t1, push1)
        push2 = interior & both
        slot2 = jnp.minimum(slot + 1, STACK - 1)
        stack_n = put(stack_n, slot2, near, push2)
        stack_t0 = put(stack_t0, slot2, t0, push2)
        stack_t1 = put(stack_t1, slot2, t_mid_near, push2)
        sp = jnp.where(push2, jnp.minimum(slot + 2, STACK),
                       jnp.where(push1, slot + 1, sp1))

        return {"stack_n": stack_n, "stack_t0": stack_t0,
                "stack_t1": stack_t1, "sp": sp, "hit": hit,
                "lfirst": lfirst, "lcount": lcount}

    out = jax.lax.while_loop(cond, body, state)
    return out["hit"]


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

    node_lo, node_hi = bvh["lo"], bvh["hi"]
    node_right, node_first = bvh["right"], bvh["first"]
    node_count = bvh["count"]

    def cond(s):
        return jnp.any((s["sp"] > 0) & ~s["hit"])

    def body(s):
        active = (s["sp"] > 0) & ~s["hit"]
        sp1 = jnp.where(active, s["sp"] - 1, s["sp"])
        slot = jnp.maximum(sp1, 0)
        node = jnp.take_along_axis(s["stack"], slot[:, None], axis=1)[:, 0]
        node = jnp.where(active, node, 0)

        lo = node_lo[node]
        hi = node_hi[node]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.00000024
        hit_box = active & (t_near <= t_far) & (t_far > t_min) & (t_near < t_max)

        count = node_count[node]
        is_leaf = count > 0
        lt, _ = _leaf_t(o, kz, shear, tri, node_first[node], count,
                        t_min, t_max)
        hit = s["hit"] | (hit_box & is_leaf & (lt < t_max))

        do_push = hit_box & ~is_leaf
        left = node + 1
        right = node_right[node]
        stack = s["stack"]
        put = lambda st, pos, val, m: jax.vmap(
            lambda row, p, v, mm: jnp.where(mm, row.at[p].set(v), row)
        )(st, pos, val, m)
        stack = put(stack, slot, right, do_push)
        stack = put(stack, jnp.minimum(slot + 1, STACK - 1), left, do_push)
        sp = jnp.where(do_push, jnp.minimum(slot + 2, STACK), sp1)

        return {"stack": stack, "sp": sp, "hit": hit}

    out = jax.lax.while_loop(cond, body, state)
    return out["hit"]
