"""Pallas TPU packet traversal over a block kd-tree.

The reference's primary mesh accelerator is ``Mesh = KdTree``
(``src/tracer/object/kdtree.rs:9``) walked per ray with a (node, t0, t1)
stack (``kdtree.rs:101-169``).  The XLA per-lane formulation of that walk
(``accel/traverse.py``) gathers from (M,)-sized node tables per ray and
locks the chip beyond ~50k triangles (VERDICT r2/r3), so TPU use was
honestly capped.  This module is the packet re-design (VERDICT r4 task
6), sharing the leaf-block scaffolding of ``pallas_bvh``:

* each Pallas program owns R = sub*128 rays, ONE scalar node stack in
  SMEM, and VMEM (STACK, sub, 128) mirrors of the per-ray [t0, t1] cell
  intervals — the kd analog of the BVH kernel's scalar stack;
* interior nodes split the per-ray intervals against the plane in dense
  vector math (no gathers; the split/axis scalars come from SMEM);
* leaves are blocks of up to ``lblk`` de-duplicated triangles DMA'd from
  HBM and tested densely ((R, lblk) Woop watertight), exactly like the
  BVH leaf path — triangles straddling a split simply appear in several
  blocks, which keeps correctness: every wanted cell tests every
  triangle overlapping it, and closest-hit keeps the global minimum;
* per-ray best-t pruning (``tbest``) gives the ordered-traversal early
  exit of the reference walk (skip cells starting beyond the best hit).

Oversized reference leaves (Wald–Havran leaves are unbounded) are
chunked into a balanced chain of synthetic visit-both nodes
(``AXIS_BOTH``) so no block exceeds ``lblk``.

Traversal is not differentiated: ``scene.trace._closest`` re-derives the
hit ``t`` differentiably from the returned primitive id.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.config import INF
from lumo_tpu.accel.pallas_bvh import (BLK_ROWS, _F32, _I32, _pad_pack_rays,
                                       _pairwise_tri_t)

LBLK = 256
STACK = 64          # kd build caps depth at 48; chain nodes add ~log2
SUB = 8
MAX_NODES_SMEM = 16384
MAX_LBLK = 1024

AXIS_LEAF = 3       # matches accel.kdtree axis encoding
AXIS_BOTH = 4       # synthetic chain node: both children, full ranges

_SCALARS = ("split", "axis", "right", "count", "blk", "root")


# ---------------------------------------------------------------------------
# host-side packing

def _collect_leaf_prims(root, axis, right, first, count, prims):
    """Distinct prim ids referenced by any leaf under ``root``."""
    ids = set()
    stack = [root]
    while stack:
        i = stack.pop()
        if axis[i] == AXIS_LEAF:
            f, c = first[i], count[i]
            ids.update(prims[f:f + c].tolist())
        else:
            stack.append(right[i])
            stack.append(i + 1)
    return sorted(ids)


def pack_kd_blocks(kd, tri_a, tri_b, tri_c, lblk=LBLK):
    """Collapse a flat host kd-tree (``accel.kdtree.KdTree`` fields) into
    the kernel tables.  Returns a dict of numpy arrays:

      split (M,) f32; axis/right/count/blk (M,) i32 (axis 0-2 interior,
      3 leaf, 4 synthetic both-children); root (8,) f32 scene bounds;
      tri_blk (NBLK, BLK_ROWS, lblk) f32 leaf data (row 9 = prim id);
      depth, lblk ints.
    """
    axis = np.asarray(kd.axis)
    right = np.asarray(kd.right)
    first = np.asarray(kd.first)
    count = np.asarray(kd.count)
    split = np.asarray(kd.split, np.float32)
    prims = np.asarray(kd.prims)
    M = len(axis)

    # upper bound on distinct prims per subtree (sum of leaf counts)
    leafsum = np.zeros(M, np.int64)
    for i in range(M - 1, -1, -1):
        if axis[i] == AXIS_LEAF:
            leafsum[i] = count[i]
        else:
            leafsum[i] = leafsum[i + 1] + leafsum[right[i]]

    while True:
        out = {k: [] for k in ("split", "axis", "right", "count", "blk")}
        blocks = []
        depth_max = [1]

        def emit(sp, ax, cnt, blk):
            out["split"].append(float(sp))
            out["axis"].append(int(ax))
            out["right"].append(0)
            out["count"].append(int(cnt))
            out["blk"].append(int(blk))
            return len(out["axis"]) - 1

        def emit_leaf(ids):
            blk = len(blocks)
            blocks.append(ids)
            return emit(0.0, AXIS_LEAF, len(ids), blk)

        def emit_chunked(ids, depth):
            """Balanced both-children chain over lblk-sized chunks."""
            depth_max[0] = max(depth_max[0], depth)
            if len(ids) <= lblk:
                return emit_leaf(ids)
            mid = (len(ids) + 1) // 2
            mid = -(-mid // lblk) * lblk  # chunk-align the split
            slot = emit(0.0, AXIS_BOTH, 0, 0)
            emit_chunked(ids[:mid], depth + 1)
            out["right"][slot] = len(out["axis"])
            emit_chunked(ids[mid:], depth + 1)
            return slot

        stack = [(0, -1, 1)]
        while stack:
            orig, patch, depth = stack.pop()
            depth_max[0] = max(depth_max[0], depth)
            if patch >= 0:
                out["right"][patch] = len(out["axis"])
            if leafsum[orig] <= lblk or axis[orig] == AXIS_LEAF:
                ids = _collect_leaf_prims(orig, axis, right, first, count,
                                          prims)
                emit_chunked(ids, depth)
            else:
                slot = emit(split[orig], axis[orig], 0, 0)
                stack.append((int(right[orig]), slot, depth + 1))
                stack.append((orig + 1, -1, depth + 1))

        if len(out["axis"]) <= MAX_NODES_SMEM or lblk >= MAX_LBLK:
            break
        lblk *= 2

    if len(out["axis"]) > MAX_NODES_SMEM:
        raise ValueError(
            f"collapsed kd-tree has {len(out['axis'])} nodes > "
            f"MAX_NODES_SMEM={MAX_NODES_SMEM} at lblk={lblk}")
    if depth_max[0] > STACK:
        raise ValueError(
            f"collapsed kd depth {depth_max[0]} exceeds STACK={STACK}")

    a = np.asarray(tri_a, np.float32)
    b = np.asarray(tri_b, np.float32)
    c = np.asarray(tri_c, np.float32)
    assert len(a) < (1 << 24), "prim ids stored as exact f32"
    nblk = max(len(blocks), 1)
    tri_blk = np.zeros((nblk, BLK_ROWS, lblk), np.float32)
    for bi, ids in enumerate(blocks):
        cnt = len(ids)
        idx = np.asarray(ids, np.int64)
        tri_blk[bi, 0:3, :cnt] = a[idx].T
        tri_blk[bi, 3:6, :cnt] = b[idx].T
        tri_blk[bi, 6:9, :cnt] = c[idx].T
        tri_blk[bi, 9, :cnt] = idx.astype(np.float32)

    packed = {
        "split": np.asarray(out["split"], np.float32),
        "axis": np.asarray(out["axis"], np.int32),
        "right": np.asarray(out["right"], np.int32),
        "count": np.asarray(out["count"], np.int32),
        "blk": np.asarray(out["blk"], np.int32),
        "root": np.concatenate([np.asarray(kd.root_lo, np.float32),
                                np.asarray(kd.root_hi, np.float32),
                                np.zeros(2, np.float32)]),
        "tri_blk": tri_blk,
        "depth": int(depth_max[0]),
        "lblk": int(lblk),
    }
    return packed


def to_device(packed):
    """numpy pack → device BlockTree ('depth'/'lblk' static ints, so a
    scene holding one can be a jit argument — see pallas_bvh.BlockTree)."""
    from lumo_tpu.accel.pallas_bvh import BlockTree
    arrays = {k: jnp.asarray(packed[k]) for k in _SCALARS}
    arrays["tri_blk"] = jnp.asarray(packed["tri_blk"])
    return BlockTree(arrays=arrays, lblk=int(packed["lblk"]),
                     depth=int(packed["depth"]))


# ---------------------------------------------------------------------------
# kernel

def _kd_kernel(split, axisv, right, count, blkid, root,
               rays, rays_t, tri_hbm, t_out, prim_out,
               blk_buf, stack_n, stack_t0, stack_t1,
               pend_t0, pend_t1, tbest, sem, *, lblk, any_hit, sub):
    """One packet: scalar node stack in SMEM + (STACK, sub, 128) VMEM
    interval stacks; reference walk ``kdtree.rs:101-169`` vectorized over
    the packet.  PBR fig 4.19 split cases are folded into per-ray
    interval clips (a ray lying exactly in the plane visits both
    children over its full interval, as does a synthetic AXIS_BOTH
    node)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = sub * 128
    eps_up = _F32(1.00000024)
    ox, oy, oz = rays[0], rays[1], rays[2]
    dx, dy, dz = rays[3], rays[4], rays[5]
    tmax0 = rays[6]

    def inv(v):
        tiny = jnp.where(v < 0, _F32(-1e-30), _F32(1e-30))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-30, tiny, v)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    rt = rays_t[0]
    col = lambda c_: rt[:, c_:c_ + 1]
    ox_c, oy_c, oz_c = col(0), col(1), col(2)
    dx_c, dy_c, dz_c = col(3), col(4), col(5)
    tmax_c = col(6)
    adx, ady, adz = jnp.abs(dx_c), jnp.abs(dy_c), jnp.abs(dz_c)
    kz_c = jnp.where((adx > ady) & (adx > adz), 0,
                     jnp.where(ady > adz, 1, 2))
    dpx = jnp.where(kz_c == 0, dy_c, jnp.where(kz_c == 1, dz_c, dx_c))
    dpy = jnp.where(kz_c == 0, dz_c, jnp.where(kz_c == 1, dx_c, dy_c))
    dpz = jnp.where(kz_c == 0, dx_c, jnp.where(kz_c == 1, dy_c, dz_c))
    inv_z = 1.0 / jnp.where(dpz == 0.0, _F32(1e-30), dpz)
    sx, sy, sz = -dpx * inv_z, -dpy * inv_z, inv_z

    sgn = [jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0]

    dead8 = tmax0 <= 0.0
    dead_c = tmax_c <= 0.0
    t_out[...] = jnp.where(dead_c, _F32(-INF), tmax_c)
    prim_out[...] = jnp.full((R, 1), -1, _I32)
    tbest[...] = jnp.where(dead8, _F32(-INF), tmax0)

    # per-ray root entry interval (reference kd_entry clip)
    t0x, t1x = (root[0] - ox) * ix, (root[3] - ox) * ix
    t0y, t1y = (root[1] - oy) * iy, (root[4] - oy) * iy
    t0z, t1z = (root[2] - oz) * iz, (root[5] - oz) * iz
    e0 = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                 jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    e1 = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                 jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z)) * eps_up
    e0 = jnp.maximum(e0, _F32(0.0))
    e1 = jnp.minimum(e1, tmax0)
    e1 = jnp.where(dead8, _F32(-INF), e1)
    stack_n[0] = _I32(0)
    stack_t0[0] = e0
    stack_t1[0] = e1
    eye = (jax.lax.broadcasted_iota(_I32, (128, 128), 0)
           == jax.lax.broadcasted_iota(_I32, (128, 128), 1))

    def want_of(t0v, t1v):
        return (t0v <= t1v) & (t1v > 0.0) & (t0v < tbest[...] * eps_up)

    def process_leaf(bi):
        """Test pending leaf in blk_buf[bi] using its stored intervals
        (want recomputed against the CURRENT tbest)."""
        want = want_of(pend_t0[bi], pend_t1[bi])
        id_row = blk_buf[bi, 9:10, :]
        buf2d = blk_buf[bi]
        for r in range(sub):
            rw = jnp.any(want[r])

            @pl.when(rw)
            def _row(r=r):
                sl = slice(r * 128, (r + 1) * 128)
                tt = _pairwise_tri_t(
                    ox_c[sl], oy_c[sl], oz_c[sl], kz_c[sl],
                    sx[sl], sy[sl], sz[sl], buf2d, _F32(0.0), t_out[sl])
                # padding slots carry id 0 with degenerate (det==0) data
                # — already INF from the watertight test
                tb = jnp.min(tt, axis=1, keepdims=True)
                pid = jnp.min(jnp.where(tt <= tb, id_row, _F32(3e7)),
                              axis=1, keepdims=True).astype(_I32)
                better = tb < t_out[sl]
                t_out[sl] = jnp.where(better, tb, t_out[sl])
                prim_out[sl] = jnp.where(better, pid, prim_out[sl])
                tb_row = jnp.min(
                    jnp.where(eye, jnp.broadcast_to(tb, (128, 128)), INF),
                    axis=0, keepdims=True)
                if any_hit:
                    tbest[r:r + 1, :] = jnp.where(
                        tb_row < INF, _F32(-INF), tbest[r:r + 1, :])
                else:
                    tbest[r:r + 1, :] = jnp.minimum(tbest[r:r + 1, :],
                                                    tb_row)

    def cond(carry):
        sp, ndone, pend, cur = carry
        live = sp > 0
        if any_hit:
            live &= ndone < R
        return live

    def body(carry):
        sp, ndone, pend, cur = carry
        node = stack_n[sp - 1]
        t0v = stack_t0[sp - 1]
        t1v = stack_t1[sp - 1]
        want = want_of(t0v, t1v)
        hit_any = jnp.any(want)
        ax = axisv[node]
        is_leaf = ax == AXIS_LEAF
        leaf_hit = hit_any & is_leaf

        @pl.when(leaf_hit)
        def _leaf():
            pltpu.make_async_copy(tri_hbm.at[blkid[node]],
                                  blk_buf.at[cur], sem.at[cur]).start()
            pend_t0[cur] = t0v
            pend_t1[cur] = t1v

            @pl.when(pend >= 0)
            def _drain_prev():
                pltpu.make_async_copy(tri_hbm.at[blkid[pend]],
                                      blk_buf.at[1 - cur],
                                      sem.at[1 - cur]).wait()
                process_leaf(1 - cur)

        # interval split (computed unconditionally — cheap vector math;
        # the pushes are gated)
        axc = jnp.minimum(ax, 2)
        o_a = jnp.where(axc == 0, ox, jnp.where(axc == 1, oy, oz))
        d_a = jnp.where(axc == 0, dx, jnp.where(axc == 1, dy, dz))
        i_a = jnp.where(axc == 0, ix, jnp.where(axc == 1, iy, iz))
        s_ = split[node]
        tp = (s_ - o_a) * i_a
        dpos = d_a >= 0.0
        full = ((d_a == 0.0) & (o_a == s_)) | (ax == AXIS_BOTH)
        t0L = jnp.where(full, t0v, jnp.where(dpos, t0v,
                                             jnp.maximum(t0v, tp)))
        t1L = jnp.where(full, t1v, jnp.where(dpos, jnp.minimum(t1v, tp),
                                             t1v))
        t0R = jnp.where(full, t0v, jnp.where(dpos, jnp.maximum(t0v, tp),
                                             t0v))
        t1R = jnp.where(full, t1v, jnp.where(dpos, t1v,
                                             jnp.minimum(t1v, tp)))
        interior_on = hit_any & ~is_leaf
        wantL = jnp.any(want_of(t0L, t1L)) & interior_on
        wantR = jnp.any(want_of(t0R, t1R)) & interior_on
        near_left = jnp.where(axc == 0, sgn[0],
                              jnp.where(axc == 1, sgn[1], sgn[2]))
        left = node + 1
        rightc = right[node]
        # push FAR first so NEAR pops next (packet-majority ordering)
        far_n = jnp.where(near_left, rightc, left)
        near_n = jnp.where(near_left, left, rightc)
        want_far = jnp.where(near_left, wantR, wantL)
        want_near = jnp.where(near_left, wantL, wantR)
        base = sp - 1

        @pl.when(want_far)
        def _push_far():
            stack_n[base] = far_n
            stack_t0[base] = jnp.where(near_left, t0R, t0L)
            stack_t1[base] = jnp.where(near_left, t1R, t1L)

        slot2 = jnp.minimum(base + jnp.where(want_far, 1, 0), STACK - 1)

        @pl.when(want_near)
        def _push_near():
            stack_n[slot2] = near_n
            stack_t0[slot2] = jnp.where(near_left, t0L, t0R)
            stack_t1[slot2] = jnp.where(near_left, t1L, t1R)

        n_push = jnp.where(want_far, 1, 0) + jnp.where(want_near, 1, 0)
        sp = jnp.minimum(base + n_push, STACK)
        pend = jnp.where(leaf_hit, node, pend)
        cur = jnp.where(leaf_hit, 1 - cur, cur)
        if any_hit:
            ndone = jnp.sum((prim_out[...] >= 0).astype(_I32)) \
                + jnp.sum(dead_c.astype(_I32))
        return sp, ndone, pend, cur

    _, _, pend, cur = jax.lax.while_loop(
        cond, body, (_I32(1), _I32(0), _I32(-1), _I32(0)))

    @pl.when(pend >= 0)
    def _drain_last():
        pltpu.make_async_copy(tri_hbm.at[blkid[pend]],
                              blk_buf.at[1 - cur], sem.at[1 - cur]).wait()
        process_leaf(1 - cur)

    t_out[...] = jnp.where(prim_out[...] >= 0, t_out[...], INF)


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret", "sub", "lblk"))
def _run(scalars, tri_blk, packed, packed_t, *, any_hit, lblk,
         interpret=False, sub=SUB):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsub = packed.shape[1]
    NP = nsub // sub
    R = sub * 128
    kern = functools.partial(_kd_kernel, lblk=lblk, any_hit=any_hit,
                             sub=sub)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    t, prim = pl.pallas_call(
        kern,
        grid=(NP,),
        in_specs=[smem_spec] * len(_SCALARS) + [
            pl.BlockSpec((8, sub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP * R, 1), _F32),
            jax.ShapeDtypeStruct((NP * R, 1), _I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BLK_ROWS, lblk), _F32),
            pltpu.SMEM((STACK,), _I32),
            pltpu.VMEM((STACK, sub, 128), _F32),
            pltpu.VMEM((STACK, sub, 128), _F32),
            pltpu.VMEM((2, sub, 128), _F32),
            pltpu.VMEM((2, sub, 128), _F32),
            pltpu.VMEM((sub, 128), _F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*[scalars[k] for k in _SCALARS], packed, packed_t, tri_blk)
    return t, prim


def _sort_perm(blk, o, d, t_max):
    """Morton + octant coherence sort against the kd root bounds."""
    from lumo_tpu.accel import pallas_bvh as pb
    return pb._sort_perm({"root": blk["root"]}, o, d, t_max)


def _prep(blk, o, d, t_max, interpret, sub):
    N = o.shape[0]
    if isinstance(t_max, (int, float)):
        t_max = jnp.full((N,), t_max, _F32)
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    perm = _sort_perm(blk, o, d, t_max)
    packed, packed_t, n, NP = _pad_pack_rays(o, d, t_max, perm, sub)
    scalars = {k: blk[k] for k in _SCALARS}
    return scalars, packed, packed_t, n, perm, interpret


def closest_hit(blk, o, d, t_min=0.0, t_max=INF, interpret=None, sub=SUB):
    """Drop-in counterpart of ``traverse.kd_closest_hit`` over the packed
    block kd-tree.  Returns (t (N,), prim (N,)); prim=-1 / t=INF on miss."""
    scalars, packed, packed_t, n, perm, interpret = _prep(
        blk, o, d, t_max, interpret, sub)
    t, prim = _run(scalars, blk["tri_blk"], packed, packed_t,
                   any_hit=False, lblk=blk["lblk"], interpret=interpret,
                   sub=sub)
    both = jnp.concatenate(
        [jax.lax.bitcast_convert_type(t, _I32).reshape(-1, 1)[:n],
         prim.reshape(-1, 1)[:n]], axis=1)
    out = jnp.zeros((n, 2), _I32).at[perm].set(both)
    return jax.lax.bitcast_convert_type(out[:, 0], _F32), out[:, 1]


def any_hit(blk, o, d, t_min=0.0, t_max=INF, interpret=None, sub=SUB):
    """Occlusion query: True where any triangle lies in (t_min, t_max)."""
    scalars, packed, packed_t, n, perm, interpret = _prep(
        blk, o, d, t_max, interpret, sub)
    t, prim = _run(scalars, blk["tri_blk"], packed, packed_t,
                   any_hit=True, lblk=blk["lblk"], interpret=interpret,
                   sub=sub)
    occ = (prim.reshape(-1)[:n]) >= 0
    return jnp.zeros((n,), bool).at[perm].set(occ)
