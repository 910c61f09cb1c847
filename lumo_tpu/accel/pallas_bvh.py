"""Pallas TPU packet-traversal kernel over a block BVH.

The reference walks its flattened BVH one ray at a time with a 64-deep
stack (``src/tracer/object/bvh.rs:315-362``).  Round 2's XLA re-design
kept one stack *per ray lane* and paid for every pop with (N,)-indexed
gathers from (M,) node tables — which XLA:TPU lowers to work that scales
with the TABLE size, so a 330k-triangle scene locks the chip (VERDICT r2
item 1).  This module is the TPU-native fix:

**Packet traversal** (Wald et al. 2001 adapted to the VPU): each Pallas
program owns a packet of R rays and ONE scalar stack in SMEM scratch.
A node is visited if *any* ray in the packet wants it — the slab test is
a dense vector op against scalar node bounds read from SMEM, the
any-reduce is a scalar, and the stack never needs per-lane scatters.
Leaves are blocks of up to ``LBLK`` triangles stored contiguously in HBM
and DMA'd into VMEM on demand; the leaf test is a dense (R, LBLK) Woop
watertight intersection — pure VPU work with zero gathers.  Nothing in
the kernel scales with scene size except the one leaf DMA.

The block tree is derived host-side by collapsing subtrees of the
standard leaf-4 BVH (``build.py``) whose primitive ranges are contiguous
by construction, so no rebuild is needed and both the numpy and native
builders feed it.

Traversal is not differentiated: ``scene.trace._closest`` re-derives the
hit ``t`` differentiably from the returned primitive id.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.config import INF

LBLK = 128      # triangles per leaf block (measured faster than
                # 256 on the bench mix once rows dominate: the
                # (128, lblk) Woop sweep halves while row count
                # grows only ~35%; the doubling loop still grows
                # lblk for scenes past MAX_NODES_SMEM)
MAX_LBLK = 1024  # doubling cap (VMEM leaf-row temporaries ~5 MB here)
BLK_ROWS = 16   # f32 sublane padding: rows 0-8 = ax..cz, rest unused
STACK = 64      # same bound as the reference walk (``bvh.rs:324``)
SUB = 8         # ray sublane rows per packet → R = SUB * 128 rays
                # (8 is the Mosaic sublane tile: block shapes whose
                # trailing dims aren't (8k, 128) fail TPU lowering)
MAX_NODES_SMEM = 16384   # node table cap; lblk doubles until under it

_F32 = jnp.float32
_I32 = jnp.int32


# ---------------------------------------------------------------------------
# host-side packing

def _subtree_ranges(node_right, node_first, node_count):
    """Per-node total prim count of each subtree.  Prim ranges need NOT
    be contiguous (the threaded native builder claims leaf ranges in
    completion order): blocks carry explicit prim-id rows instead."""
    M = len(node_right)
    count_t = np.zeros(M, np.int64)
    is_leaf = node_count > 0
    for i in range(M - 1, -1, -1):
        if is_leaf[i]:
            count_t[i] = node_count[i]
        else:
            count_t[i] = count_t[i + 1] + count_t[node_right[i]]
    return count_t


def _collect_prims(root, node_right, node_first, node_count):
    """Prim ids (into the permuted triangle arrays) of subtree `root`."""
    ids = []
    stack = [root]
    while stack:
        i = stack.pop()
        c = node_count[i]
        if c > 0:
            f = node_first[i]
            ids.extend(range(f, f + c))
        else:
            stack.append(node_right[i])
            stack.append(i + 1)
    return ids


def pack_blocks(bvh, tri_a, tri_b, tri_c, lblk=LBLK, seed_tri=None):
    """Build the kernel tables from a flattened leaf-4 BVH (numpy dicts
    or the device dict from ``scene.build``).

    Returns dict of numpy arrays:
      lo_x..hi_z   (M,) f32 — node bounds, SMEM-resident columns
      right, first, count, blk (M,) i32 — count > 0 marks a block leaf,
                   ``first`` is the leaf's first prim in the permuted
                   triangle arrays, ``blk`` its block index; axis (M,) i32
      tri_blk (NBLK, BLK_ROWS, lblk) f32 — leaf triangle data, component
                   rows ax ay az bx by bz cx cy cz, zero padded
      depth   int — max stack depth of the collapsed tree
    """
    node_right = np.asarray(bvh["right"])
    node_first = np.asarray(bvh["first"])
    node_count = np.asarray(bvh["count"])
    node_axis = np.asarray(bvh["axis"])
    node_lo = np.asarray(bvh["lo"], np.float32)
    node_hi = np.asarray(bvh["hi"], np.float32)
    count_t = _subtree_ranges(node_right, node_first, node_count)

    while True:
        out = {k: [] for k in ("lo_x", "lo_y", "lo_z", "hi_x", "hi_y",
                               "hi_z", "right", "first", "count", "axis",
                               "blk")}
        blocks = []  # list of prim-id lists
        depth_max = 1

        def emit(orig, leaf_blk, nprims):
            slot = len(out["right"])
            lo, hi = node_lo[orig], node_hi[orig]
            for k, v in zip(("lo_x", "lo_y", "lo_z"), lo):
                out[k].append(float(v))
            for k, v in zip(("hi_x", "hi_y", "hi_z"), hi):
                out[k].append(float(v))
            out["right"].append(0)
            out["first"].append(0)
            out["count"].append(nprims)
            out["axis"].append(int(node_axis[orig]))
            out["blk"].append(leaf_blk if leaf_blk is not None else 0)
            return slot

        # iterative DFS preorder rebuild of the collapsed tree
        stack = [(0, -1, 1)]  # (orig, parent slot to patch right, depth)
        while stack:
            orig, patch, depth = stack.pop()
            depth_max = max(depth_max, depth)
            if patch >= 0:
                out["right"][patch] = len(out["right"])
            if count_t[orig] <= lblk or node_count[orig] > 0:
                ids = _collect_prims(orig, node_right, node_first,
                                     node_count)
                blk = len(blocks)
                blocks.append(ids)
                emit(orig, blk, len(ids))
            else:
                slot = emit(orig, None, 0)
                # push right first so left lands at slot+1
                stack.append((int(node_right[orig]), slot, depth + 1))
                stack.append((orig + 1, -1, depth + 1))

        # The leaf test materializes its temporaries per 128-ray ROW
        # ((128, lblk) f32, ~10 of them — 5 MB at lblk=1024), not per
        # packet, so lblk can double to 1024 before the 16 MB scoped-VMEM
        # budget bites: 1024-tri blocks with MAX_NODES_SMEM interior
        # nodes cover ~16M triangles (VERDICT r4 task 2 lifted the old
        # 256 cap that stranded bistro-class scenes at ~2M).
        if len(out["right"]) <= MAX_NODES_SMEM or lblk >= MAX_LBLK:
            break
        lblk *= 2

    # oversized original leaves (shouldn't happen with leaf-4 builders)
    assert max(len(ids) for ids in blocks) <= lblk
    assert len(tri_a) < (1 << 24), "prim ids stored as exact f32"
    # the lblk doubling loop caps at MAX_LBLK (VMEM budget), so meshes
    # beyond ~16M tris can exit with an oversized table or a too-deep
    # collapsed tree; fail loudly rather than letting the kernel silently
    # drop stack pushes (missed intersections) or fail at compile
    if len(out["right"]) > MAX_NODES_SMEM:
        raise ValueError(
            f"collapsed BVH has {len(out['right'])} nodes > "
            f"MAX_NODES_SMEM={MAX_NODES_SMEM} at lblk={lblk}; mesh too "
            f"large for the packet kernel ({len(tri_a)} tris)")
    if depth_max > STACK:
        raise ValueError(
            f"collapsed BVH depth {depth_max} exceeds the kernel stack "
            f"bound STACK={STACK}")

    wide = _collapse4(out)
    if wide["depth"] > STACK:
        raise ValueError(
            f"BVH4 worst-case stack {wide['depth']} exceeds STACK={STACK}")

    a = np.asarray(tri_a, np.float32)
    b = np.asarray(tri_b, np.float32)
    c = np.asarray(tri_c, np.float32)
    nblk = len(blocks)
    # padding slots hold a degenerate origin triangle: all edge functions
    # are 0 → det == 0 → the watertight test rejects it.  Row 9 carries
    # the global prim id as an exact small-integer f32.
    tri_blk = np.zeros((nblk, BLK_ROWS, lblk), np.float32)
    for bi, ids in enumerate(blocks):
        cnt = len(ids)
        idx = np.asarray(ids, np.int64)
        tri_blk[bi, 0:3, :cnt] = a[idx].T
        tri_blk[bi, 3:6, :cnt] = b[idx].T
        tri_blk[bi, 6:9, :cnt] = c[idx].T
        tri_blk[bi, 9, :cnt] = idx.astype(np.float32)
    packed = dict(wide)
    packed["tri_blk"] = tri_blk
    packed["lblk"] = int(lblk)
    # t_max seeding set: the handful of dominant-area triangles (room
    # walls, floors).  Packet traversal pays for the UNION of its rays'
    # wanted nodes, and until a ray finds its first hit it prunes with
    # t=INF — measured on the bench scene (327k-tri blob in a Cornell
    # box) packets pop 559 wide nodes vs the 256 a final-t-pruned walk
    # needs, because ~77% of bounce rays terminate on a wall the walk
    # only discovers late.  Dense-testing these few triangles first
    # (wrapper, (N, K) Woop — trivial) seeds every ray's t_max with its
    # wall distance, so the walk starts tight.
    if seed_tri is not None:
        # caller supplies the seed set (scene.build splits dominant-area
        # triangles OUT of this tree and tests them densely — reference
        # analog: walls are Plane/Rectangle objects outside the Mesh
        # kd-tree, ``scene.rs`` object list)
        packed["seed"] = np.asarray(seed_tri, np.float32).reshape(-1, 9)
    else:
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
        total = float(area.sum())
        if len(area) > 16 and total > 0:
            sel = np.nonzero(area >= total * 8.0 / len(area))[0]
            if len(sel) > 64:
                sel = sel[np.argsort(area[sel])[::-1][:64]]
        else:
            sel = np.zeros(0, np.int64)
        packed["seed"] = np.concatenate(
            [a[sel], b[sel], c[sel]], axis=1).astype(np.float32)
    return packed


def _collapse4(out):
    """Collapse the binary block tree into 4-wide (BVH4) node tables.

    The kernel's while loop pays a vector→scalar round trip per
    iteration (the ``any(want)`` reduce the scalar core must wait for);
    measured at ~1 µs it dominated the binary walk (~365 pops/packet on
    bounce packets vs ~180 µs of actual leaf VPU work).  A 4-wide node
    tests FOUR child slabs per pop and only ever pushes children that
    some ray wants, so pops shrink to (wanted interiors/2 + leaf visits)
    — the classic wide-BVH trade of more vector work (4 slab tests/pop,
    each ~30 cheap (sub,128) VPU ops) for fewer serial iterations.

    Tables (M4 wide nodes, B leaf blocks):
      cb_{lo,hi}_{x,y,z} (4*M4,) f32 — child-slot bounds; empty slots
        carry inverted boxes so their slab test can never pass
      code (4*M4,) i32 — w+1 for wide child w, -(blk+1) for leaf block
        blk, 0 for empty
      ax0/axl/axr (M4,) i32 — split axes: node, left child, right child
        (near-child ordering from the packet-majority direction signs)
      b{lo,hi}_{x,y,z} (B,) f32, cnt_blk (B,) i32 — leaf-block bounds
        (pop-time re-test against the shrunken per-ray t) and prim count
      root (8,) f32 — root bounds (host-side Morton sort normalization)
      depth int — worst-case stack occupancy (child with the deepest
        subtree processed while all its siblings still sit below it)
    """
    right2 = np.asarray(out["right"], np.int64)
    count2 = np.asarray(out["count"], np.int64)
    blk2 = np.asarray(out["blk"], np.int64)
    axis2 = np.asarray(out["axis"], np.int64)
    lo2 = np.stack([out["lo_x"], out["lo_y"], out["lo_z"]],
                   1).astype(np.float32)
    hi2 = np.stack([out["hi_x"], out["hi_y"], out["hi_z"]],
                   1).astype(np.float32)
    is_leaf2 = count2 > 0
    nblk = int(blk2[is_leaf2].max()) + 1 if is_leaf2.any() else 0

    blo = np.zeros((nblk, 3), np.float32)
    bhi = np.zeros((nblk, 3), np.float32)
    cnt_blk = np.zeros(nblk, np.int32)
    for i in np.nonzero(is_leaf2)[0]:
        blo[blk2[i]] = lo2[i]
        bhi[blk2[i]] = hi2[i]
        cnt_blk[blk2[i]] = count2[i]

    wide_id = {}
    order = []

    def intern(n):
        if n not in wide_id:
            wide_id[n] = len(order)
            order.append(n)
        return wide_id[n]

    cb_lo, cb_hi, code, ax0, axl, axr = [], [], [], [], [], []
    if is_leaf2[0]:
        # degenerate: whole scene is one block
        cb_lo.append(np.vstack([lo2[0], np.full((3, 3), 1e30, np.float32)]))
        cb_hi.append(np.vstack([hi2[0], np.full((3, 3), -1e30, np.float32)]))
        code.append([-(int(blk2[0]) + 1), 0, 0, 0])
        ax0.append(0)
        axl.append(0)
        axr.append(0)
        n_children = [1]
    else:
        intern(0)
        n_children = []
        qi = 0
        while qi < len(order):
            w2 = order[qi]
            qi += 1
            slots = []          # (code, lo, hi) per slot, pair-aligned
            axes = [int(axis2[w2]), 0, 0]
            for side_pos, side in enumerate((w2 + 1, int(right2[w2]))):
                if is_leaf2[side]:
                    slots.append((-(int(blk2[side]) + 1), lo2[side],
                                  hi2[side]))
                    slots.append(None)
                else:
                    axes[1 + side_pos] = int(axis2[side])
                    for g in (side + 1, int(right2[side])):
                        if is_leaf2[g]:
                            slots.append((-(int(blk2[g]) + 1), lo2[g],
                                          hi2[g]))
                        else:
                            slots.append((intern(g) + 1, lo2[g], hi2[g]))
            lo_k = np.full((4, 3), 1e30, np.float32)
            hi_k = np.full((4, 3), -1e30, np.float32)
            code_k = [0, 0, 0, 0]
            nch = 0
            for k, s in enumerate(slots):
                if s is None:
                    continue
                code_k[k], lo_k[k], hi_k[k] = s
                nch += 1
            cb_lo.append(lo_k)
            cb_hi.append(hi_k)
            code.append(code_k)
            ax0.append(axes[0])
            axl.append(axes[1])
            axr.append(axes[2])
            n_children.append(nch)

    M4 = len(code)
    code = np.asarray(code, np.int32)
    # worst-case stack: H(w) = (children-1) + max_child H(child); leaves 1
    H = np.ones(M4, np.int64)
    for w in range(M4 - 1, -1, -1):
        hc = 1
        for k in range(4):
            c = code[w, k]
            if c > 0:
                hc = max(hc, H[c - 1])
        H[w] = (n_children[w] - 1) + hc
    cb_lo = np.concatenate(cb_lo, 0).reshape(M4 * 4, 3)
    cb_hi = np.concatenate(cb_hi, 0).reshape(M4 * 4, 3)
    root = np.zeros(8, np.float32)
    root[0:3], root[3:6] = lo2[0], hi2[0]
    return {
        "cb_lo_x": cb_lo[:, 0], "cb_lo_y": cb_lo[:, 1],
        "cb_lo_z": cb_lo[:, 2], "cb_hi_x": cb_hi[:, 0],
        "cb_hi_y": cb_hi[:, 1], "cb_hi_z": cb_hi[:, 2],
        "code": code.reshape(-1),
        "ax0": np.asarray(ax0, np.int32), "axl": np.asarray(axl, np.int32),
        "axr": np.asarray(axr, np.int32),
        "blo_x": blo[:, 0], "blo_y": blo[:, 1], "blo_z": blo[:, 2],
        "bhi_x": bhi[:, 0], "bhi_y": bhi[:, 1], "bhi_z": bhi[:, 2],
        "cnt_blk": cnt_blk, "root": root,
        "depth": int(H[0]) if M4 else 1,
    }


_SCALARS = ("cb_lo_x", "cb_lo_y", "cb_lo_z", "cb_hi_x", "cb_hi_y",
            "cb_hi_z", "code", "ax0", "axl", "axr",
            "blo_x", "blo_y", "blo_z", "bhi_x", "bhi_y", "bhi_z",
            "cnt_blk")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockTree:
    """Device block pack.  A pytree whose ``lblk``/``depth`` are STATIC
    aux data, so a scene holding one can be passed as a jit ARGUMENT
    (required for huge scenes: closed-over arrays are embedded as HLO
    constants, and the compile tunnel rejects ~GB requests with HTTP
    413).  Dict-style ``blk[key]`` access is kept for compatibility."""
    arrays: Any
    lblk: int = dataclasses.field(metadata=dict(static=True))
    depth: int = dataclasses.field(metadata=dict(static=True))

    def __getitem__(self, k):
        if k == "lblk":
            return self.lblk
        if k == "depth":
            return self.depth
        return self.arrays[k]


def to_device(packed):
    """numpy pack → device BlockTree ('depth'/'lblk' static ints)."""
    arrays = {k: jnp.asarray(packed[k]) for k in _SCALARS}
    arrays["tri_blk"] = jnp.asarray(packed["tri_blk"])
    arrays["root"] = jnp.asarray(packed["root"])
    arrays["seed"] = jnp.asarray(packed["seed"])
    return BlockTree(arrays=arrays, lblk=int(packed["lblk"]),
                     depth=int(packed["depth"]))


# ---------------------------------------------------------------------------
# kernel

def _pairwise_tri_t(ox, oy, oz, kz, sx, sy, sz, tri, t_min, t_max):
    """Woop watertight test of R rays x lblk triangles.

    Ray quantities are (R, 1) columns; ``tri`` is the (BLK_ROWS, lblk)
    VMEM leaf block.  Mirrors ``geometry.intersect.triangle_t`` (itself a
    port of the reference ``triangle.rs:63-187``) including the
    conservative error bound on t.  Returns t (R, lblk), INF on miss.
    """
    from lumo_tpu.config import gamma_bound

    def shear_xyz(r0, r1, r2):
        vx = tri[r0:r0 + 1, :] - ox
        vy = tri[r1:r1 + 1, :] - oy
        vz = tri[r2:r2 + 1, :] - oz
        px = jnp.where(kz == 0, vy, jnp.where(kz == 1, vz, vx))
        py = jnp.where(kz == 0, vz, jnp.where(kz == 1, vx, vy))
        pz = jnp.where(kz == 0, vx, jnp.where(kz == 1, vy, vz))
        return px + sx * pz, py + sy * pz, sz * pz

    ax, ay, az = shear_xyz(0, 1, 2)
    bx, by, bz = shear_xyz(3, 4, 5)
    cx, cy, cz = shear_xyz(6, 7, 8)

    e0 = bx * cy - by * cx
    e1 = cx * ay - cy * ax
    e2 = ax * by - ay * bx

    miss_sign = ((jnp.minimum(jnp.minimum(e0, e1), e2) < 0.0)
                 & (jnp.maximum(jnp.maximum(e0, e1), e2) > 0.0))
    det = e0 + e1 + e2
    t_scaled = e0 * az + e1 * bz + e2 * cz

    # sign-folded range check (a boolean select lowers to an i1 trunci
    # Mosaic rejects): t_min*det < t_scaled < t_max*det with both sides
    # multiplied by sign(det)
    s = jnp.where(det < 0.0, _F32(-1.0), _F32(1.0))
    ts = t_scaled * s
    abs_d = det * s
    out_range = (ts < t_min * abs_d) | (ts > t_max * abs_d)
    ok = ~miss_sign & (det != 0.0) & ~out_range
    t = jnp.where(ok, t_scaled / jnp.where(det == 0.0, 1.0, det), INF)

    max_z = jnp.maximum(jnp.abs(az), jnp.maximum(jnp.abs(bz), jnp.abs(cz)))
    max_x = jnp.maximum(jnp.abs(ax), jnp.maximum(jnp.abs(bx), jnp.abs(cx)))
    max_y = jnp.maximum(jnp.abs(ay), jnp.maximum(jnp.abs(by), jnp.abs(cy)))
    d_z = gamma_bound(3) * max_z
    d_x = gamma_bound(5) * (max_x + max_z)
    d_y = gamma_bound(5) * (max_y + max_z)
    d_e = 2.0 * (gamma_bound(2) * max_x * max_y + d_y * max_x + d_x * max_y)
    max_e = jnp.maximum(jnp.abs(e0), jnp.maximum(jnp.abs(e1), jnp.abs(e2)))
    # det-scaled form of ``t <= t_min + d_t`` (d_t = num/|det|): avoids
    # the second vector divide — ts = t*|det| exactly, so compare
    # ts <= t_min*|det| + num (|det| from the sign fold above)
    num = 3.0 * (gamma_bound(3) * max_e * max_z + d_e * max_z
                 + d_z * max_e)
    return jnp.where(ts <= t_min * abs_d + num, INF, t)


def _traverse_kernel(cb_lo_x, cb_lo_y, cb_lo_z, cb_hi_x, cb_hi_y, cb_hi_z,
                     n_code, n_ax0, n_axl, n_axr,
                     blo_x, blo_y, blo_z, bhi_x, bhi_y, bhi_z, n_cnt,
                     rays, rays_t, tri_hbm, t_out, prim_out,
                     *rest, lblk, any_hit, sub, stats=False):
    """One packet: R = sub*128 rays, scalar SMEM stack, leaf DMA.

    BVH4 walk (round 5): every loop iteration pays a vector→scalar
    round trip for the ``any(want)`` reduces the scalar core consumes —
    measured ~1 µs each, ~2/3 of a bounce packet's walk with the old
    one-node-per-pop binary loop (~365 pops).  The wide loop pops only
    nodes some ray WANTS (children are slab-tested at the parent, all
    four reduces issued back-to-back under one stall) and pushes wanted
    children far-to-near, so bounce packets drop to ~half the serial
    iterations for the same visited set.

    Mosaic cannot freely relayout (sub, 128) <-> (R, 1) vectors, so the
    packet carries the SAME rays in two layouts: ``rays`` comp-major
    (8, sub, 128) drives the full-lane slab test; ``rays_t`` (R, 8)
    yields the (R, 1) lane-slices the dense (R, lblk) leaf test
    broadcasts against.  PER-RAY t pruning (round 4): ``tbest`` is a
    (sub, 128) slab-layout mirror of the per-ray best t, updated from
    each leaf row's (128, 1) result through an eye-masked min-reduce
    (the one relayout Mosaic can't do directly).  The r3 kernel pruned
    with the scalar ``t_worst = max(t)`` instead, which is INF until
    every ray has hit something — packets walked essentially the whole
    tree (measured 3731 visited nodes/packet vs 58 with per-ray t)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if stats:
        stat_out, blk_buf, stack, tbest, sem, ctl = rest
        stat_out[...] = jnp.zeros((8, 128), _I32)
    else:
        stat_out = None
        blk_buf, stack, tbest, sem, ctl = rest

    R = sub * 128
    t_min = _F32(0.0)
    ox, oy, oz = rays[0], rays[1], rays[2]       # (sub, 128)
    dx, dy, dz = rays[3], rays[4], rays[5]
    tmax0 = rays[6]

    def inv(v):
        tiny = jnp.where(v < 0, _F32(-1e-30), _F32(1e-30))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-30, tiny, v)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    # (R, 1) ray columns from the transposed copy
    rt = rays_t[0]                               # (R, 8)
    col = lambda c: rt[:, c:c + 1]
    ox_c, oy_c, oz_c = col(0), col(1), col(2)
    dx_c, dy_c, dz_c = col(3), col(4), col(5)
    tmax_c = col(6)

    # Woop per-ray setup (matches geometry.intersect.ray_setup)
    adx, ady, adz = jnp.abs(dx_c), jnp.abs(dy_c), jnp.abs(dz_c)
    kz_c = jnp.where((adx > ady) & (adx > adz), 0,
                     jnp.where(ady > adz, 1, 2))
    dpx = jnp.where(kz_c == 0, dy_c, jnp.where(kz_c == 1, dz_c, dx_c))
    dpy = jnp.where(kz_c == 0, dz_c, jnp.where(kz_c == 1, dx_c, dy_c))
    dpz = jnp.where(kz_c == 0, dx_c, jnp.where(kz_c == 1, dy_c, dz_c))
    inv_z = 1.0 / jnp.where(dpz == 0.0, _F32(1e-30), dpz)
    sx, sy, sz = -dpx * inv_z, -dpy * inv_z, inv_z

    # packet-majority ray direction sign per axis (near-child ordering)
    sgn = [jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0]

    dead8 = tmax0 <= 0.0                 # ray padding lanes, slab layout
    dead_c = tmax_c <= 0.0               # same lanes, column layout
    ndead = jnp.sum(dead_c.astype(_I32)) if any_hit else None
    t_out[...] = jnp.where(dead_c, _F32(-INF), tmax_c)
    prim_out[...] = jnp.full((R, 1), -1, _I32)
    # per-ray prune state in slab layout; dead lanes never want a node
    tbest[...] = jnp.where(dead8, _F32(-INF), tmax0)
    stack[0] = _I32(1)                   # wide root's code
    eye = (jax.lax.broadcasted_iota(_I32, (128, 128), 0)
           == jax.lax.broadcasted_iota(_I32, (128, 128), 1))

    def _slab(blox, bloy, bloz, bhix, bhiy, bhiz):
        t0x, t1x = (blox - ox) * ix, (bhix - ox) * ix
        t0y, t1y = (bloy - oy) * iy, (bhiy - oy) * iy
        t0z, t1z = (bloz - oz) * iz, (bhiz - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z)) * _F32(1.00000024)
        # conservative prune: inflate the (positive) best-t bound so fp
        # error in tn can never drop a node containing the true closest
        return (tn <= tf) & (tf > t_min) & (tn < tbest[...]
                                            * _F32(1.00000024))

    def child_want(slot):
        return _slab(cb_lo_x[slot], cb_lo_y[slot], cb_lo_z[slot],
                     cb_hi_x[slot], cb_hi_y[slot], cb_hi_z[slot])

    def leaf_want(b):
        return _slab(blo_x[b], blo_y[b], blo_z[b],
                     bhi_x[b], bhi_y[b], bhi_z[b])

    def process_leaf(b, bi):
        """Test the rows of pending leaf block ``b`` against the data in
        ``blk_buf[bi]`` (its DMA must be complete).  The
        want mask is recomputed against the CURRENT tbest — tighter
        than when the leaf was popped."""
        want = leaf_want(b)
        count = n_cnt[b]
        lane = jax.lax.broadcasted_iota(_I32, (128, lblk), 1)
        buf2d = blk_buf[bi]
        id_row = buf2d[9:10, :]                              # (1, lblk)
        for r in range(sub):
            rw = jnp.any(want[r])

            @pl.when(rw)
            def _row(r=r):
                if stats:
                    stat_out[2:3, :] = stat_out[2:3, :] + 1
                sl = slice(r * 128, (r + 1) * 128)
                tt = _pairwise_tri_t(
                    ox_c[sl], oy_c[sl], oz_c[sl], kz_c[sl],
                    sx[sl], sy[sl], sz[sl], buf2d, t_min, t_out[sl])
                tt = jnp.where(lane < count, tt, INF)
                tb = jnp.min(tt, axis=1, keepdims=True)     # (128, 1)
                # prim id of the best slot: min id among t-ties
                # (matches the dense argmin tie-break); ids are exact
                # small-int f32 (row 9)
                pid = jnp.min(jnp.where(tt <= tb, id_row, _F32(3e7)),
                              axis=1, keepdims=True).astype(_I32)
                better = tb < t_out[sl]   # dead lanes at -INF: never
                t_out[sl] = jnp.where(better, tb, t_out[sl])
                prim_out[sl] = jnp.where(better, pid, prim_out[sl])
                # mirror the new best t into the slab-layout prune
                # state: eye-masked min-reduce = (128,1) -> (1,128)
                tb_row = jnp.min(
                    jnp.where(eye, jnp.broadcast_to(tb, (128, 128)),
                              INF), axis=0, keepdims=True)
                if any_hit:
                    # occlusion: a hit ray stops participating
                    tbest[r:r + 1, :] = jnp.where(
                        tb_row < INF, _F32(-INF), tbest[r:r + 1, :])
                else:
                    tbest[r:r + 1, :] = jnp.minimum(
                        tbest[r:r + 1, :], tb_row)
        if any_hit:
            # hits only appear here, so the early-exit count updates
            # per processed leaf instead of per pop
            ctl[3] = jnp.sum((prim_out[...] >= 0).astype(_I32)) + ndead

    # control state lives in SMEM (not the while carry) so the leaf and
    # interior branches each run ONLY their own slab tests/reduces —
    # with carry state both arms' vector work ran on every pop
    # (ctl: 0 sp, 1 pend, 2 cur, 3 ndone, 4 n_int, 5 n_leaf)
    ctl[0] = _I32(1)
    ctl[1] = _I32(-1)
    ctl[2] = _I32(0)
    ctl[3] = _I32(0)
    ctl[4] = _I32(0)
    ctl[5] = _I32(0)

    def cond(live):
        return live

    def body(live):
        sp = ctl[0]
        e = stack[sp - 1]                    # >0 wide node+1, <0 -(blk+1)
        is_leaf = e < 0

        @pl.when(is_leaf)
        def _leaf_pop():
            b = -e - 1
            ctl[0] = sp - 1
            if stats:
                ctl[5] = ctl[5] + 1
            # pop-time re-test against the CURRENT shrunken per-ray t
            # (the parent tested these bounds at push time, but leaves
            # found since may have tightened tbest past this block)
            leaf_hit = jnp.any(leaf_want(b))

            # Double-buffered leaf pipeline: start this leaf's DMA into
            # blk_buf[cur], then (while it flies) process the PREVIOUS
            # leaf from the other buffer.  The DMA latency hides behind
            # the previous leaf's row tests and later interior pops.
            @pl.when(leaf_hit)
            def _leaf():
                pend, cur = ctl[1], ctl[2]
                pltpu.make_async_copy(tri_hbm.at[b],
                                      blk_buf.at[cur], sem.at[cur]).start()
                ctl[1] = b
                ctl[2] = 1 - cur

                @pl.when(pend >= 0)
                def _drain_prev():
                    pltpu.make_async_copy(tri_hbm.at[pend],
                                          blk_buf.at[1 - cur],
                                          sem.at[1 - cur]).wait()
                    process_leaf(pend, 1 - cur)

        @pl.when(~is_leaf)
        def _interior_pop():
            # slab-test all four child slots (the four reduces issue
            # back-to-back — ONE vector→scalar stall covers them), then
            # push wanted children far-to-near so the near pops first
            w = e - 1
            base = 4 * w
            if stats:
                ctl[4] = ctl[4] + 1
            # empty slots MUST be gated by code != 0: their inverted
            # boxes pass the slab test (tn = -inf <= tf = +inf), and
            # popping code 0 reads node tables at base -4 — a cycle
            w0 = (n_code[base] != 0) & jnp.any(child_want(base))
            w1 = (n_code[base + 1] != 0) & jnp.any(child_want(base + 1))
            w2 = (n_code[base + 2] != 0) & jnp.any(child_want(base + 2))
            w3 = (n_code[base + 3] != 0) & jnp.any(child_want(base + 3))

            def sgn_of(ax):
                # (3-arg select_n unsupported by the Mosaic lowering)
                return jnp.where(ax == 0, sgn[0],
                                 jnp.where(ax == 1, sgn[1], sgn[2]))

            pos0 = sgn_of(n_ax0[w])
            posl = sgn_of(n_axl[w])
            posr = sgn_of(n_axr[w])
            la = jnp.where(posl, 0, 1)       # left pair near slot
            ra = jnp.where(posr, 2, 3)       # right pair near slot
            j0 = jnp.where(pos0, la, ra)     # near → far slot order
            j1 = jnp.where(pos0, 1 - la, 5 - ra)
            j2 = jnp.where(pos0, ra, la)
            j3 = jnp.where(pos0, 5 - ra, 1 - la)

            sp2 = sp - 1
            for j in (j3, j2, j1, j0):       # push far first
                wj = jnp.where(j == 0, w0,
                               jnp.where(j == 1, w1,
                                         jnp.where(j == 2, w2, w3)))
                # unconditional write one past the top; only wanted
                # slots advance sp, unwanted ones are overwritten
                stack[jnp.minimum(sp2, STACK - 1)] = n_code[base + j]
                sp2 = sp2 + jnp.where(wj & (sp2 < STACK), 1, 0)
            ctl[0] = sp2

        live2 = ctl[0] > 0
        if any_hit:
            live2 &= ctl[3] < R
        return live2

    jax.lax.while_loop(cond, body, jnp.bool_(True))
    if stats:
        stat_out[0:1, :] = stat_out[0:1, :] + ctl[4]
        stat_out[1:2, :] = stat_out[1:2, :] + ctl[5]

    # drain the last pending leaf
    pend, cur = ctl[1], ctl[2]

    @pl.when(pend >= 0)
    def _drain_last():
        pltpu.make_async_copy(tri_hbm.at[pend],
                              blk_buf.at[1 - cur],
                              sem.at[1 - cur]).wait()
        process_leaf(pend, 1 - cur)

    # misses (and tmax-padding lanes) report INF
    t_out[...] = jnp.where(prim_out[...] >= 0, t_out[...], INF)


def _pad_pack_rays(o, d, t_max, perm, sub):
    """(N, 3) rays → comp-major (8, NSUB, 128) + transposed (NP, R, 8),
    permuted by ``perm`` with ONE row gather.

    XLA:TPU gathers read a full 128-lane padded tile per row regardless
    of width, so permuting o/d/t_max separately costs 3 gathers where
    one (N, 8) wide permute costs one (~2 ms each at 65k rays — the
    wrapper was a third of the whole closest-hit call).  Both layouts
    index ray ``r = block*R + row*128 + lane`` identically; padding
    lanes get d=0 and tmax=0 and the kernel marks them dead."""
    N = o.shape[0]
    R = sub * 128
    NP = -(-N // R)
    pad = NP * R - N
    wide = jnp.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                      d[:, 2], t_max, jnp.zeros((N,), _F32)],
                     axis=-1).astype(_F32)           # (N, 8)
    wide = wide[perm]                                # one row gather
    wide = jnp.pad(wide, ((0, pad), (0, 0)))
    packed_t = wide.reshape(NP, R, 8)
    packed = wide.T.reshape(8, NP * sub, 128)
    return packed, packed_t, N, NP


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret", "sub", "lblk",
                                    "stats"))
def _run(scalars, tri_blk, packed, packed_t, *, any_hit, lblk,
         interpret=False, sub=SUB, stats=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsub = packed.shape[1]
    NP = nsub // sub
    R = sub * 128
    kern = functools.partial(_traverse_kernel, lblk=lblk,
                             any_hit=any_hit, sub=sub, stats=stats)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_specs = [
        pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NP * R, 1), _F32),
        jax.ShapeDtypeStruct((NP * R, 1), _I32),
    ]
    if stats:
        # per-packet (interior, leaf, row-test) counters, broadcast
        # across an (8, 128) i32 block — Mosaic rejects narrow (1, 2)
        # output blocks, so lane 0 of rows 0/1/2 carries the values
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((NP * 8, 128), _I32))
    out = pl.pallas_call(
        kern,
        grid=(NP,),
        in_specs=[smem_spec] * len(_SCALARS) + [
            pl.BlockSpec((8, sub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, BLK_ROWS, lblk), _F32),   # double-buffered leaf
            pltpu.SMEM((STACK,), _I32),
            pltpu.VMEM((sub, 128), _F32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((8,), _I32),                  # ctl: sp/pend/cur/...
        ],
        interpret=interpret,
    )(*[scalars[k] for k in _SCALARS], packed, packed_t, tri_blk)
    return out if stats else (out[0], out[1])


def _sort_perm(blk, o, d, t_max):
    """Coherence sort: permutation ordering rays by origin Morton code
    (root-AABB-normalized, 6 bits/axis) then direction octant.

    A packet shares ONE stack: with incoherent bounce rays every packet
    visits most of the tree and the kernel collapses to brute force.
    Sorting clusters rays that want the same subtrees into the same
    packets (wavefront ray-sorting, Aila/Laine-class), and pushes dead
    (t_max<=0) lanes into all-dead packets that exit on the root test."""
    lo, hi = blk["root"][0:3], blk["root"][3:6]
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 1.0)
    cell = jnp.minimum((q * 64.0).astype(jnp.uint32), 63)

    def spread3(x):  # ≤10 bits → every 3rd bit (standard Morton spread)
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = (spread3(cell[:, 0]) | (spread3(cell[:, 1]) << 1)
              | (spread3(cell[:, 2]) << 2))
    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    key = (morton << 3) | octant
    key = jnp.where(t_max > 0.0, key, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(key)


def _seed_t(blk, o, d, t_max):
    """Dense (N, K) Woop test against the pack's dominant-area seed
    triangles; returns a per-ray inflated hit-t upper bound to start
    the walk pruned (see pack_blocks).  The 1.0001 inflation keeps the
    seed hit itself strictly inside the kernel's range test, so the
    result set is bit-identical with or without seeding."""
    seed = blk["seed"]
    if int(seed.shape[0]) == 0:
        return t_max
    from lumo_tpu.geometry import intersect as geo
    kz, shear = geo.ray_setup(d)
    a, b, c = seed[None, :, 0:3], seed[None, :, 3:6], seed[None, :, 6:9]
    t_all, _, _ = geo.triangle_t(o, kz, shear, a, b, c, 0.0,
                                 t_max[..., None])
    t_seed = jnp.min(t_all, axis=-1)
    return jnp.minimum(t_max, jnp.where(jnp.isfinite(t_seed),
                                        t_seed * _F32(1.0001), t_max))


def _prep(blk, o, d, t_max, interpret, sub, seed=True):
    N = o.shape[0]
    if isinstance(t_max, (int, float)):
        t_max = jnp.full((N,), t_max, _F32)
    if interpret is None:
        # the container exposes the chip behind the 'axon' platform name
        interpret = jax.default_backend() in ("cpu", "gpu")
    if seed:
        t_max = _seed_t(blk, o, d, t_max)
    perm = _sort_perm(blk, o, d, t_max)
    packed, packed_t, n, NP = _pad_pack_rays(o, d, t_max, perm, sub)
    scalars = {k: blk[k] for k in _SCALARS}
    return scalars, packed, packed_t, n, perm, interpret


def closest_hit(blk, o, d, t_min=0.0, t_max=INF, interpret=None, sub=SUB,
                seed=True):
    """Drop-in counterpart of ``traverse.closest_hit`` over the packed
    block BVH ``blk`` (device dict from :func:`to_device`).
    Returns (t (N,), prim (N,)), prim = -1 / t = INF on miss.
    ``seed=False`` skips the t_max-seeding dense pre-test (callers that
    already tightened t_max themselves, e.g. ``trace._closest``)."""
    scalars, packed, packed_t, n, perm, interpret = _prep(
        blk, o, d, t_max, interpret, sub, seed=seed)
    t, prim = _run(scalars, blk["tri_blk"], packed, packed_t,
                   any_hit=False, lblk=blk["lblk"], interpret=interpret,
                   sub=sub)
    # one wide (n, 2) row scatter instead of two narrow ones (same tile
    # economics as the _pad_pack_rays gather); int32 carrier so no fp
    # canonicalization can touch the bit patterns
    both = jnp.concatenate(
        [jax.lax.bitcast_convert_type(t, _I32).reshape(-1, 1)[:n],
         prim.reshape(-1, 1)[:n]], axis=1)
    out = jnp.zeros((n, 2), _I32).at[perm].set(both)
    return jax.lax.bitcast_convert_type(out[:, 0], _F32), out[:, 1]


def closest_hit_stats(blk, o, d, t_min=0.0, t_max=INF, interpret=None,
                      sub=SUB):
    """closest_hit + per-packet (interior visits, leaf visits) counters —
    divergence evidence for the packet design (VERDICT r4 task 1).
    Returns (t (N,), prim (N,), stats (NP, 3) int32): per-packet
    interior visits, leaf visits (DMAs), and leaf-row tests executed."""
    scalars, packed, packed_t, n, perm, interpret = _prep(
        blk, o, d, t_max, interpret, sub)
    t, prim, st = _run(scalars, blk["tri_blk"], packed, packed_t,
                       any_hit=False, lblk=blk["lblk"], interpret=interpret,
                       sub=sub, stats=True)
    st = st.reshape(-1, 8, 128)[:, :3, 0]
    both = jnp.concatenate(
        [jax.lax.bitcast_convert_type(t, _I32).reshape(-1, 1)[:n],
         prim.reshape(-1, 1)[:n]], axis=1)
    out = jnp.zeros((n, 2), _I32).at[perm].set(both)
    return (jax.lax.bitcast_convert_type(out[:, 0], _F32), out[:, 1], st)


def any_hit(blk, o, d, t_min=0.0, t_max=INF, interpret=None, sub=SUB,
            seed=True):
    """Occlusion query: True where any triangle lies in (t_min, t_max).

    Rays the seed set (dominant-area walls) already occludes skip the
    walk entirely: they enter as dead lanes (t_max 0) and the sort
    packs them into all-dead packets."""
    N = o.shape[0]
    if isinstance(t_max, (int, float)):
        t_max = jnp.full((N,), t_max, _F32)
    if seed:
        t_seeded = _seed_t(blk, o, d, t_max)
        occ_seed = t_seeded < t_max
        t_run = jnp.where(occ_seed, _F32(0.0), t_max)
    else:
        occ_seed = jnp.zeros((N,), bool)
        t_run = t_max
    scalars, packed, packed_t, n, perm, interpret = _prep(
        blk, o, d, t_run, interpret, sub, seed=False)
    t, prim = _run(scalars, blk["tri_blk"], packed, packed_t,
                   any_hit=True, lblk=blk["lblk"], interpret=interpret,
                   sub=sub)
    occ = (prim.reshape(-1)[:n]) >= 0
    return jnp.zeros((n,), bool).at[perm].set(occ) | occ_seed
