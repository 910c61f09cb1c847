"""Scene building: host-side accumulation → flat device SoA arrays.

The reference stores polymorphic ``Box<dyn Object>`` trees
(``src/tracer/scene.rs``); the TPU design flattens everything to two
primitive families (triangles, spheres) in SoA layout at build time —
rectangles, cubes and instanced meshes are baked into world-space
triangles — so device code is pure dense array math.  Scenes above a size
threshold get a binned-SAH BVH (``lumo_tpu.accel``) whose leaf order the
triangle arrays are permuted into, so traversal needs no indirection.
Lights get a Walker alias table (reference ``bvh.rs:104-191``) built
host-side for O(1) power-proportional sampling on device.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.scene.materials import LIGHT, Material, pack_materials

BVH_THRESHOLD = 64  # brute-force below this many triangles


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneData:
    """Device scene: everything jit-traceable. Primitive ids are global:
    [0, T) triangles, [T, T+S) spheres."""
    # triangles (T, ...)
    tri_a: Any
    tri_b: Any
    tri_c: Any
    tri_na: Any
    tri_nb: Any
    tri_nc: Any
    tri_uva: Any
    tri_uvb: Any
    tri_uvc: Any
    tri_mat: Any
    # spheres (S, ...)
    sph_center: Any
    sph_radius: Any
    sph_mat: Any
    # analytic primitives — plane/disk/cone/cylinder (A, ...):
    # rigid local frame (rot rows world→local, translation) + (radius,
    # height) params (reference ``{plane,disk,cone,cylinder}.rs``)
    ana_kind: Any
    ana_rot: Any
    ana_trans: Any
    ana_radius: Any
    ana_height: Any
    ana_mat: Any
    # lights
    light_prim: Any       # (L,) global prim id
    light_pdf: Any        # (L,) sampling probability
    alias_p: Any          # (L,) alias acceptance threshold
    alias_idx: Any        # (L,) alias target
    prim_light: Any       # (P,) light index per prim, -1 if not a light
    # material table (dict of arrays)
    materials: Any
    # texture table (dict of arrays) or None
    textures: Any
    # BVH over triangles (dict of arrays) or None (brute force)
    bvh: Any
    # packed block BVH for the Pallas TPU traversal kernel (dict of
    # arrays from ``accel.pallas_bvh.pack_blocks``) or None
    bvh_blk: Any
    # kd-tree over triangles (dict of arrays) or None; when set it is the
    # triangle accelerator (reference Mesh = KdTree, ``kdtree.rs:9``)
    kdtree: Any
    # packed block kd-tree for the Pallas TPU packet kernel (dict from
    # ``accel.pallas_kd.pack_kd_blocks``) or None
    kd_blk: Any
    # homogeneous participating medium (dict of arrays) or None
    medium: Any
    # runtime-instanced mesh groups (tuple of dicts): ONE copy of the
    # local-space geometry per group (a/b/c/na../uva.., its own bvh/blk)
    # plus per-instance world→local maps (minv), forward maps (mfwd),
    # translations and material overrides — the reference's
    # ``Instance<T>`` (``instance.rs:5-15``): rays are inverse-transformed
    # at query time, geometry is never duplicated
    inst: Any
    # world bounds (2, 3)
    bounds: Any
    # static metadata
    tex_kinds: tuple = dataclasses.field(metadata=dict(static=True))
    n_normal_maps: int = dataclasses.field(metadata=dict(static=True))
    n_tris: int = dataclasses.field(metadata=dict(static=True))
    n_spheres: int = dataclasses.field(metadata=dict(static=True))
    n_analytic: int = dataclasses.field(metadata=dict(static=True))
    n_inst_prims: int = dataclasses.field(metadata=dict(static=True))
    n_ana_lights: int = dataclasses.field(metadata=dict(static=True))
    n_lights: int = dataclasses.field(metadata=dict(static=True))
    n_shadow_rays: int = dataclasses.field(metadata=dict(static=True))
    # first n_bvh_tris triangles are covered by the accelerator; tris in
    # [n_bvh_tris, n_tris) are split-out dominant-area geometry (walls)
    # dense-tested by ``trace`` (reference: walls are objects outside
    # the Mesh kd-tree).  Equal to n_tris when nothing is split out.
    n_bvh_tris: int = dataclasses.field(default=-1,
                                        metadata=dict(static=True))

    def __post_init__(self):
        if self.n_bvh_tris < 0:
            object.__setattr__(self, "n_bvh_tris", self.n_tris)

    def rebuild_light_alias(self) -> "SceneData":
        """Recompute the light-selection pdf + Walker alias table from the
        CURRENT material table (host-side, numpy).

        ``build()`` bakes selection probabilities from the initial
        emission; a user optimizing emission via ``dataclasses.replace``
        keeps an unbiased estimator (``sample_light`` returns the pdf it
        actually used) but samples lights with stale, variance-pessimal
        probabilities.  Call this after changing ``ke`` / ``emit_scale``
        / ``illum`` to re-match selection to power.  Not jit-traceable.
        """
        from lumo_tpu.color import dense as dense_mod
        L = self.n_lights
        if L == 0:
            return self
        m = {k: np.asarray(v) for k, v in self.materials.items()
             if k in ("ke", "illum", "emit_scale", "two_sided", "kind")}
        lam = 360.0 + 5.0 * np.arange(m["illum"].shape[1])
        x = (lam[None, :] - 360.0) / 470.0
        t = (m["ke"][:, 0:1] * x * x + m["ke"][:, 1:2] * x + m["ke"][:, 2:3])
        ke = m["ke"][:, 3:4] * (0.5 + t / (2.0 * np.sqrt(1.0 + t * t)))
        y = dense_mod.table("Y")
        phi = (np.sum(ke * m["illum"] * y[None, :], axis=1)
               * dense_mod.STEP / dense_mod.Y_INTEGRAL)
        phi = phi * m["emit_scale"] * np.where(m["two_sided"], 2.0, 1.0)
        phi = np.where(m["kind"] == LIGHT, phi, 0.0)

        lp = np.asarray(self.light_prim)
        T, S = self.n_tris, self.n_spheres
        areas = np.zeros(L)
        mats = np.zeros(L, np.int32)
        for i, p in enumerate(lp):
            if p < T:
                a = np.asarray(self.tri_a[p])
                b = np.asarray(self.tri_b[p])
                c = np.asarray(self.tri_c[p])
                areas[i] = 0.5 * np.linalg.norm(np.cross(b - a, c - a))
                mats[i] = int(self.tri_mat[p])
            elif p < T + S:
                r = float(self.sph_radius[p - T])
                areas[i] = 4.0 * np.pi * r * r
                mats[i] = int(self.sph_mat[p - T])
            else:
                r = float(self.ana_radius[p - T - S])
                areas[i] = np.pi * r * r
                mats[i] = int(self.ana_mat[p - T - S])
        pdf, accept, alias = _build_alias(areas * phi[mats])
        jf = lambda a: jnp.asarray(a, np.asarray(self.light_pdf).dtype)
        return dataclasses.replace(
            self, light_pdf=jf(pdf), alias_p=jf(accept),
            alias_idx=jnp.asarray(alias, jnp.int32))


def _empty_tri_chunk():
    return {
        "a": np.zeros((0, 3)), "b": np.zeros((0, 3)), "c": np.zeros((0, 3)),
        "na": np.zeros((0, 3)), "nb": np.zeros((0, 3)), "nc": np.zeros((0, 3)),
        "uva": np.zeros((0, 2)), "uvb": np.zeros((0, 2)), "uvc": np.zeros((0, 2)),
    }


class SceneBuilder:
    """Accumulates primitives host-side; ``build()`` packs the device scene.

    Mirrors the reference's ``Scene::{add, add_light, build}`` API surface
    (``scene.rs:33-77``) but flattens to SoA.
    """

    def __init__(self):
        from lumo_tpu.texture import Textures
        self.textures = Textures()
        self._tri_chunks = []  # list of (geom dict, mat_idx, is_light)
        self._spheres = []     # list of (center, radius, mat_idx, is_light)
        self._analytic = []    # list of (kind, rot, trans, r, h, mat, is_light)
        self._inst_groups = []  # list of (geom dict, [(4x4 M, mat_idx)])
        self._materials: list[Material] = []
        self.environment: Optional[Material] = None
        self.medium = None

    # ---- materials ----
    def material(self, mat: Material) -> int:
        self._materials.append(mat)
        return len(self._materials) - 1

    # ---- primitives ----
    def add_triangles(self, vertices, faces, mat: Material | int,
                      normals=None, vertex_normal_idx=None,
                      uvs=None, uv_idx=None, transform=None):
        """Add a triangle soup/mesh. vertices (V, 3); faces (F, 3) int.
        normals/uvs optionally indexed per face corner."""
        mid = mat if isinstance(mat, int) else self.material(mat)
        is_light = self._materials[mid].kind == LIGHT
        v = np.asarray(vertices, np.float64)
        if transform is not None:
            m = np.asarray(transform, np.float64)
            v = v @ m[:3, :3].T + m[:3, 3]
        f = np.asarray(faces, np.int64)
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        zero3 = np.zeros_like(a)
        if normals is not None and vertex_normal_idx is not None:
            n = np.asarray(normals, np.float64)
            if transform is not None:
                m = np.asarray(transform, np.float64)
                nm = np.linalg.inv(m[:3, :3]).T
                n = n @ nm.T
                norms = np.linalg.norm(n, axis=-1, keepdims=True)
                n = n / np.maximum(norms, 1e-30)
            ni = np.asarray(vertex_normal_idx, np.int64)
            na, nb, nc = n[ni[:, 0]], n[ni[:, 1]], n[ni[:, 2]]
        else:
            na = nb = nc = zero3
        if uvs is not None and uv_idx is not None:
            t = np.asarray(uvs, np.float64)
            ti = np.asarray(uv_idx, np.int64)
            uva, uvb, uvc = t[ti[:, 0]], t[ti[:, 1]], t[ti[:, 2]]
        else:
            # reference default: (0,0), (1,0), (1,1) (``triangle.rs:160-166``)
            uva = np.tile([0.0, 0.0], (len(a), 1))
            uvb = np.tile([1.0, 0.0], (len(a), 1))
            uvc = np.tile([1.0, 1.0], (len(a), 1))
        # cull degenerates (reference ``triangle_mesh.rs:57-97``)
        area2 = np.linalg.norm(np.cross(b - a, c - a), axis=-1)
        keep = area2 > 1e-20
        geom = {"a": a[keep], "b": b[keep], "c": c[keep],
                "na": na[keep], "nb": nb[keep], "nc": nc[keep],
                "uva": uva[keep], "uvb": uvb[keep], "uvc": uvc[keep]}
        self._tri_chunks.append((geom, mid, is_light))
        return mid

    def add_instanced_triangles(self, vertices, faces, transforms,
                                mats, normals=None, vertex_normal_idx=None,
                                uvs=None, uv_idx=None):
        """Register a mesh ONCE and instance it under each 4×4 affine in
        ``transforms`` with a per-instance material (override semantics,
        reference ``instance.rs:5-15``).  Rays are inverse-transformed at
        query time — geometry is NOT duplicated per instance.

        LIGHT-material instances are Sampleable like the reference's
        ``Instance<T>`` (``instance.rs:169-199``): realized by baking
        that instance's triangles to world space as ordinary light
        triangles, so NEE sampling pdfs, surface areas, and the
        power-proportional alias-table rows are exact in the transformed
        frame by construction (the Jacobian correction the reference
        applies per query is folded into the baked geometry once).
        Emissive meshes are small; only non-light instances keep the
        shared-geometry runtime path."""
        v = np.asarray(vertices, np.float64)
        f = np.asarray(faces, np.int64)
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        zero3 = np.zeros_like(a)
        if normals is not None:
            ni = np.asarray(vertex_normal_idx if vertex_normal_idx
                            is not None else f, np.int64)
            n = np.asarray(normals, np.float64)
            na, nb, nc = n[ni[:, 0]], n[ni[:, 1]], n[ni[:, 2]]
        else:
            na = nb = nc = zero3
        if uvs is not None:
            ti = np.asarray(uv_idx if uv_idx is not None else f, np.int64)
            tt = np.asarray(uvs, np.float64)
            uva, uvb, uvc = tt[ti[:, 0]], tt[ti[:, 1]], tt[ti[:, 2]]
        else:
            uva = np.tile([0.0, 0.0], (len(a), 1))
            uvb = np.tile([1.0, 0.0], (len(a), 1))
            uvc = np.tile([1.0, 1.0], (len(a), 1))
        area2 = np.linalg.norm(np.cross(b - a, c - a), axis=-1)
        keep = area2 > 1e-20
        geom = {"a": a[keep], "b": b[keep], "c": c[keep],
                "na": na[keep], "nb": nb[keep], "nc": nc[keep],
                "uva": uva[keep], "uvb": uvb[keep], "uvc": uvc[keep]}
        insts = []
        mids = []
        for m, mt in zip(transforms, mats):
            mid = mt if isinstance(mt, int) else self.material(mt)
            mm = np.asarray(m, np.float64)
            if abs(np.linalg.det(mm[:3, :3])) < 1e-30:
                raise ValueError("singular instance transform")
            if self._materials[mid].kind == LIGHT:
                # Sampleable-through-instance: bake this instance's
                # triangles to world space (see docstring)
                self.add_triangles(
                    vertices, faces, mid, normals=normals,
                    vertex_normal_idx=vertex_normal_idx, uvs=uvs,
                    uv_idx=uv_idx, transform=mm)
            else:
                insts.append((mm, mid))
            mids.append(mid)
        if insts:
            self._inst_groups.append((geom, insts))
        return mids

    def add_rectangle(self, p0, p1, p2, mat: Material | int):
        """Rectangle from three corners (reference ``rectangle.rs:43-69``:
        d = p0 + (p2 - p1)); two triangles with basis uvs."""
        p0, p1, p2 = [np.asarray(p, np.float64) for p in (p0, p1, p2)]
        p3 = p0 + (p2 - p1)
        verts = np.stack([p0, p1, p2, p3])
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        uvs = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
        uv_idx = faces
        return self.add_triangles(verts, faces, mat, uvs=uvs, uv_idx=uv_idx)

    def add_box(self, mat: Material | int, transform=None):
        """Unit cube [0,1]^3 as 12 triangles (reference ``cube.rs:9-57``),
        optionally transformed."""
        corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                           dtype=np.float64)
        quads = [  # (corner indices, CCW seen from outside)
            (0, 1, 3, 2), (4, 6, 7, 5),  # x- x+
            (0, 4, 5, 1), (2, 3, 7, 6),  # y- y+
            (0, 2, 6, 4), (1, 5, 7, 3),  # z- z+
        ]
        faces = []
        for q in quads:
            faces.append([q[0], q[1], q[2]])
            faces.append([q[0], q[2], q[3]])
        return self.add_triangles(corners, np.array(faces), mat, transform=transform)

    def add_sphere(self, center, radius, mat: Material | int,
                   transform=None):
        """Sphere; ``transform`` (4×4 affine) instances it à la reference
        ``Instance<Sphere>``: rigid + uniform scale bakes into
        (center', radius'), anything else becomes an ELLIPSOID — an
        analytic unit sphere under the affine frame
        (``instance.rs:81-105``).  Ellipsoids cannot be lights (no
        Sampleable cone sampling for them)."""
        if transform is not None:
            from lumo_tpu.geometry import analytic
            from lumo_tpu.scene.instance import sphere_instance
            try:
                center, radius = sphere_instance(center, radius, transform)
            except ValueError:
                L, trans = analytic.affine_frame(transform, center, radius)
                return self._add_analytic(analytic.SPHERE, L, trans,
                                          1.0, 0.0, mat)
        mid = mat if isinstance(mat, int) else self.material(mat)
        is_light = self._materials[mid].kind == LIGHT
        self._spheres.append((np.asarray(center, np.float64), float(radius),
                              mid, is_light))
        return mid

    def _add_analytic(self, kind, rot, trans, radius, height, mat,
                      light_ok=False):
        from lumo_tpu.geometry import analytic
        mid = mat if isinstance(mat, int) else self.material(mat)
        is_light = self._materials[mid].kind == LIGHT
        if is_light and not light_ok:
            raise ValueError("only disks can be analytic lights "
                             "(reference: Disk is the only Sampleable "
                             "analytic primitive, disk.rs:131-160)")
        self._analytic.append((int(kind), np.asarray(rot, np.float64),
                               np.asarray(trans, np.float64), float(radius),
                               float(height), mid, is_light))
        return mid

    def add_plane(self, p, n, mat: Material | int):
        """Infinite plane through point p with normal n
        (reference ``plane.rs:20-38``)."""
        from lumo_tpu.geometry import analytic
        rot = analytic.frame_from_normal(n)
        return self._add_analytic(analytic.PLANE, rot, p, 0.0, 0.0, mat)

    def add_disk(self, origin, normal, radius, mat: Material | int):
        """Disk of `radius` at `origin` facing `normal`
        (reference ``disk.rs:21-45``).  Disks may be lights (Sampleable,
        ``disk.rs:131-160``)."""
        from lumo_tpu.geometry import analytic
        assert radius > 0.0
        rot = analytic.frame_from_normal(normal)
        return self._add_analytic(analytic.DISK, rot, origin, radius, 0.0,
                                  mat, light_ok=True)

    def add_cone(self, height, radius, mat: Material | int, transform=None):
        """Cone: base circle of `radius` at y=0, apex at y=`height`
        (reference ``cone.rs:14-25``); optional rigid/uniform-scale
        transform (reference reaches it via ``Instance``)."""
        from lumo_tpu.geometry import analytic
        assert height > 0.0 and radius > 0.0
        rot, trans, s = analytic.frame_from_transform(transform)
        return self._add_analytic(analytic.CONE, rot, trans, radius * s,
                                  height * s, mat)

    def add_cylinder(self, height, radius, mat: Material | int,
                     transform=None):
        """Cylinder: base at y=0, top at y=`height`, of `radius`
        (reference ``cylinder.rs:14-25``)."""
        from lumo_tpu.geometry import analytic
        assert height > 0.0 and radius > 0.0
        rot, trans, s = analytic.frame_from_transform(transform)
        return self._add_analytic(analytic.CYLINDER, rot, trans, radius * s,
                                  height * s, mat)

    def set_environment_map(self, mat: Material):
        """Environment light: realized at build as a giant emissive sphere
        enclosing the scene (reference ``scene.rs:38-45``)."""
        self.environment = mat

    def set_medium(self, absorption, scattering, g: float):
        """Fill the scene with a homogeneous participating medium
        (reference ``Scene::set_medium`` / ``Medium::new``,
        ``medium.rs:32-57``): σt = uplift(absorption + scattering),
        σs = uplift(scattering), HG parameter g ∈ (-1, 1).  The world is
        scaled into a unit cube via t_scale = 1/extent.max at build."""
        assert -1.0 < g < 1.0
        self.medium = (np.asarray(absorption, np.float64),
                       np.asarray(scattering, np.float64), float(g))

    # ---- build ----
    def build(self, dtype=np.float32, accel: str = "bvh") -> SceneData:
        """``accel``: "bvh" (default), "kdtree" (reference-style SAH
        kd-tree over the triangle soup), or "none" (brute force)."""
        if self.environment is not None:
            lo, hi = self._host_bounds()
            center = 0.5 * (lo + hi)
            radius = float(np.linalg.norm(center - lo))
            self.add_sphere(center, max(radius, 1e-3) * 1.01, self.environment)
            self.environment = None

        # concatenate triangle chunks
        keys = list(_empty_tri_chunk().keys())
        if self._tri_chunks:
            tri = {k: np.concatenate([g[k] for g, _, _ in self._tri_chunks])
                   for k in keys}
            tri_mat = np.concatenate([
                np.full(len(g["a"]), m, np.int32)
                for g, m, _ in self._tri_chunks])
            tri_is_light = np.concatenate([
                np.full(len(g["a"]), il, bool)
                for g, _, il in self._tri_chunks])
        else:
            tri = _empty_tri_chunk()
            tri_mat = np.zeros(0, np.int32)
            tri_is_light = np.zeros(0, bool)

        T = len(tri["a"])
        S = len(self._spheres)
        A = len(self._analytic)
        P = T + S + A

        # ---- triangle accelerator: BVH (permutes triangles into leaf
        #      order) or SAH kd-tree (leaves point through an indirection
        #      list; triangle order untouched) ----
        bvh = None
        kdt = None
        T_bvh = T
        if T >= BVH_THRESHOLD and accel == "bvh":
            import time as _time
            from lumo_tpu.accel import build as accel_build
            _t0 = _time.perf_counter()
            # Split dominant-area triangles (room walls/floors) OUT of
            # the BVH: their huge AABBs otherwise pass every packet's
            # slab test and the root box grows to the whole room, which
            # wrecks both the Morton-sort normalization and the walk
            # (bench scene: interior pops 310 -> 96/packet once split).
            # They are dense-tested in ``trace`` instead — the reference
            # keeps walls as Plane/Rectangle objects OUTSIDE the mesh
            # kd-tree and linearly scans objects the same way
            # (``scene.rs`` object list).
            area = 0.5 * np.linalg.norm(
                np.cross(tri["b"] - tri["a"], tri["c"] - tri["a"]), axis=1)
            huge = np.nonzero(area >= float(area.sum()) * 8.0 / T)[0]
            if len(huge) > 64:
                huge = huge[np.argsort(area[huge])[::-1][:64]]
            if len(huge) == 0 or T - len(huge) < BVH_THRESHOLD:
                huge = np.zeros(0, np.int64)
            rest = np.setdiff1d(np.arange(T), huge)
            T_bvh = len(rest)
            lo_t, hi_t = accel_build.triangle_bounds(
                tri["a"][rest], tri["b"][rest], tri["c"][rest])
            bvh = accel_build.build(lo_t, hi_t)
            _el = _time.perf_counter() - _t0
            if _el > 0.05:
                # build-phase timing (reference ``bvh.rs:234,312``)
                print(f"BVH: {T_bvh} tris, {len(bvh.node_right)} nodes "
                      f"(+{len(huge)} split-out) in {_el:.2f}s", flush=True)
            # global order: BVH tris in leaf order, then the split-out
            # dominant tris at the tail [T_bvh, T)
            order = np.concatenate([rest[bvh.order], huge])
            tri = {k: v[order] for k, v in tri.items()}
            tri_mat = tri_mat[order]
            tri_is_light = tri_is_light[order]
        elif T >= BVH_THRESHOLD and accel == "kdtree":
            from lumo_tpu.accel import build as accel_build
            from lumo_tpu.accel import kdtree as accel_kd
            import time as _time
            _t0 = _time.perf_counter()
            lo_t, hi_t = accel_build.triangle_bounds(
                tri["a"], tri["b"], tri["c"])
            kdt = accel_kd.build(lo_t, hi_t)
            _el = _time.perf_counter() - _t0
            if _el > 0.05:
                print(f"kd-tree: {T} tris, {len(kdt.axis)} nodes "
                      f"in {_el:.2f}s", flush=True)

        sph_center = (np.stack([s[0] for s in self._spheres]) if S
                      else np.zeros((0, 3)))
        sph_radius = np.array([s[1] for s in self._spheres]) if S else np.zeros(0)
        sph_mat = np.array([s[2] for s in self._spheres], np.int32) if S else np.zeros(0, np.int32)

        ana_kind = np.array([a[0] for a in self._analytic], np.int32) \
            if A else np.zeros(0, np.int32)
        ana_rot = (np.stack([a[1] for a in self._analytic]) if A
                   else np.zeros((0, 3, 3)))
        ana_trans = (np.stack([a[2] for a in self._analytic]) if A
                     else np.zeros((0, 3)))
        ana_radius = np.array([a[3] for a in self._analytic]) if A else np.zeros(0)
        ana_height = np.array([a[4] for a in self._analytic]) if A else np.zeros(0)
        ana_mat = np.array([a[5] for a in self._analytic], np.int32) \
            if A else np.zeros(0, np.int32)

        # ---- lights + alias table (power = area × material power,
        #      reference ``bvh.rs:104-191``) ----
        prim_light = np.full(max(P, 1), -1, np.int32)
        mat_power = np.array([
            m.mean_power() * (self.textures.mean_rgb(m.ke_tex)
                              if m.ke_tex >= 0 else 1.0)
            for m in self._materials])
        light_prims_t = np.nonzero(tri_is_light)[0]
        tri_area = 0.5 * np.linalg.norm(
            np.cross(tri["b"] - tri["a"], tri["c"] - tri["a"]), axis=-1) if T else np.zeros(0)
        powers = list(tri_area[light_prims_t] * mat_power[tri_mat[light_prims_t]])
        light_prims = list(light_prims_t)
        prim_light[light_prims_t] = np.arange(len(light_prims_t))
        for j, s in enumerate(self._spheres):
            if s[3]:
                area = 4.0 * np.pi * s[1] ** 2
                prim_light[T + j] = len(light_prims)
                light_prims.append(T + j)
                powers.append(area * mat_power[s[2]])
        n_ana_lights = 0
        for j, a in enumerate(self._analytic):
            if a[6]:  # disk lights only (``disk.rs:131-135``)
                area = np.pi * a[3] ** 2
                prim_light[T + S + j] = len(light_prims)
                light_prims.append(T + S + j)
                powers.append(area * mat_power[a[5]])
                n_ana_lights += 1
        L = len(light_prims)
        if L > 0:
            import time as _time
            _t0 = _time.perf_counter()
            pdf, alias_p, alias_idx = _build_alias(np.asarray(powers, np.float64))
            _el = _time.perf_counter() - _t0
            if _el > 0.05:
                # reference prints the alias-table build (``bvh.rs:186-190``)
                print(f"light alias table: {len(powers)} lights in "
                      f"{_el:.2f}s", flush=True)
        else:
            pdf = alias_p = np.zeros(0)
            alias_idx = np.zeros(0, np.int64)

        lo, hi = self._host_bounds()

        ju = lambda x: jnp.asarray(x)
        jf = lambda x: jnp.asarray(np.asarray(x), dtype)

        # ---- medium (reference ``medium.rs:32-57``): t_scale fits the
        #      world into a unit cube; the phase material is one more row ----
        mats = list(self._materials)
        medium_dev = None
        if self.medium is not None:
            ab, sc, g = self.medium
            extent = np.maximum(hi - lo, 1e-12)
            t_scale = 1.0 / float(extent.max())
            med_mat = Material.volumetric(g, t_scale, sc + ab, sc)
            medium_dev = {
                "sigma_t": jf(med_mat.sigma_t), "sigma_s": jf(med_mat.sigma_s),
                "g": jnp.asarray(g, dtype), "t_scale": jnp.asarray(t_scale, dtype),
                "mat": jnp.asarray(len(mats), jnp.int32),
            }
            mats.append(med_mat)
        bvh_dev = None
        blk_dev = None
        if bvh is not None:
            bvh_dev = {"lo": jf(bvh.node_lo), "hi": jf(bvh.node_hi),
                       "right": ju(bvh.node_right), "first": ju(bvh.node_first),
                       "count": ju(bvh.node_count), "axis": ju(bvh.node_axis)}
            from lumo_tpu.accel import pallas_bvh
            import time as _time
            _t0 = _time.perf_counter()
            seed_tri = np.concatenate(
                [tri["a"][T_bvh:], tri["b"][T_bvh:], tri["c"][T_bvh:]],
                axis=1)
            blk = pallas_bvh.pack_blocks(
                {"lo": bvh.node_lo, "hi": bvh.node_hi,
                 "right": bvh.node_right, "first": bvh.node_first,
                 "count": bvh.node_count, "axis": bvh.node_axis},
                tri["a"][:T_bvh], tri["b"][:T_bvh], tri["c"][:T_bvh],
                seed_tri=seed_tri)
            blk_dev = pallas_bvh.to_device(blk)
            _el = _time.perf_counter() - _t0
            if _el > 0.05:
                print(f"BVH block pack: {blk['tri_blk'].shape[0]} blocks "
                      f"(lblk {blk['lblk']}) in {_el:.2f}s", flush=True)
        kd_dev = None
        kd_blk_dev = None
        if kdt is not None:
            kd_dev = {"split": jf(kdt.split), "axis": ju(kdt.axis),
                      "right": ju(kdt.right), "first": ju(kdt.first),
                      "count": ju(kdt.count), "prims": ju(kdt.prims),
                      "lo": jf(kdt.root_lo), "hi": jf(kdt.root_hi)}
            # packed block kd-tree for the Pallas packet kernel — the
            # on-chip kd path at mesh scale (VERDICT r4 task 6; the old
            # KD_TPU_MAX_TRIS=50k warn+BVH-fallback is gone)
            from lumo_tpu.accel import pallas_kd
            import time as _time
            _t0 = _time.perf_counter()
            kdb = pallas_kd.pack_kd_blocks(kdt, tri["a"], tri["b"],
                                           tri["c"])
            kd_blk_dev = pallas_kd.to_device(kdb)
            _el = _time.perf_counter() - _t0
            if _el > 0.05:
                print(f"kd block pack: {kdb['tri_blk'].shape[0]} blocks "
                      f"(lblk {kdb['lblk']}) in {_el:.2f}s", flush=True)

        # ---- runtime-instanced mesh groups: one geometry copy + local
        #      BVH per group, per-instance inverse/forward maps ----
        inst_dev = []
        n_inst_prims = 0
        for geom, insts in self._inst_groups:
            g = dict(geom)
            g_bvh = None
            g_blk = None
            if len(g["a"]) >= BVH_THRESHOLD:
                from lumo_tpu.accel import build as accel_build
                from lumo_tpu.accel import pallas_bvh
                lo_g, hi_g = accel_build.triangle_bounds(
                    g["a"], g["b"], g["c"])
                bh = accel_build.build(lo_g, hi_g)
                g = {k: v[bh.order] for k, v in g.items()}
                g_bvh = {"lo": jf(bh.node_lo), "hi": jf(bh.node_hi),
                         "right": ju(bh.node_right), "first": ju(bh.node_first),
                         "count": ju(bh.node_count), "axis": ju(bh.node_axis)}
                blk_g = pallas_bvh.pack_blocks(
                    {"lo": bh.node_lo, "hi": bh.node_hi,
                     "right": bh.node_right, "first": bh.node_first,
                     "count": bh.node_count, "axis": bh.node_axis},
                    g["a"], g["b"], g["c"])
                g_blk = pallas_bvh.to_device(blk_g)
            minv = np.stack([np.linalg.inv(m[:3, :3]) for m, _ in insts])
            mfwd = np.stack([m[:3, :3] for m, _ in insts])
            tr = np.stack([m[:3, 3] for m, _ in insts])
            inst_dev.append({
                "a": jf(g["a"]), "b": jf(g["b"]), "c": jf(g["c"]),
                "na": jf(g["na"]), "nb": jf(g["nb"]), "nc": jf(g["nc"]),
                "uva": jf(g["uva"]), "uvb": jf(g["uvb"]),
                "uvc": jf(g["uvc"]),
                "bvh": g_bvh, "blk": g_blk,
                "minv": jf(minv), "mfwd": jf(mfwd), "trans": jf(tr),
                "mat": ju(np.asarray([mid for _, mid in insts], np.int32)),
            })
            n_inst_prims += len(insts) * len(g["a"])
        return SceneData(
            tri_a=jf(tri["a"]), tri_b=jf(tri["b"]), tri_c=jf(tri["c"]),
            tri_na=jf(tri["na"]), tri_nb=jf(tri["nb"]), tri_nc=jf(tri["nc"]),
            tri_uva=jf(tri["uva"]), tri_uvb=jf(tri["uvb"]), tri_uvc=jf(tri["uvc"]),
            tri_mat=ju(tri_mat),
            sph_center=jf(sph_center), sph_radius=jf(sph_radius), sph_mat=ju(sph_mat),
            ana_kind=ju(ana_kind), ana_rot=jf(ana_rot), ana_trans=jf(ana_trans),
            ana_radius=jf(ana_radius), ana_height=jf(ana_height),
            ana_mat=ju(ana_mat),
            light_prim=ju(np.asarray(light_prims, np.int32)),
            light_pdf=jf(pdf), alias_p=jf(alias_p),
            alias_idx=ju(np.asarray(alias_idx, np.int32)),
            prim_light=ju(prim_light),
            materials={k: (jf(v) if v.dtype in (np.float32, np.float64) else ju(v))
                       for k, v in pack_materials(mats).items()},
            textures=self.textures.pack(dtype),
            bvh=bvh_dev,
            bvh_blk=blk_dev,
            kdtree=kd_dev,
            kd_blk=kd_blk_dev,
            medium=medium_dev,
            inst=tuple(inst_dev),
            tex_kinds=tuple(sorted({r["kind"] for r in self.textures.rows})),
            n_normal_maps=len(self.textures.normal_images),
            bounds=jf(np.stack([lo, hi])),
            n_tris=T, n_spheres=S, n_analytic=A,
            n_inst_prims=n_inst_prims, n_ana_lights=n_ana_lights,
            n_lights=L,
            n_shadow_rays=max(1, int(np.log2(max(L, 1))) if L > 1 else 1),
            n_bvh_tris=(T_bvh if bvh is not None else T),
        )

    def _host_bounds(self):
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for g, _, _ in self._tri_chunks:
            for k in ("a", "b", "c"):
                if len(g[k]):
                    lo = np.minimum(lo, g[k].min(axis=0))
                    hi = np.maximum(hi, g[k].max(axis=0))
        for s in self._spheres:
            lo = np.minimum(lo, s[0] - s[1])
            hi = np.maximum(hi, s[0] + s[1])
        from lumo_tpu.geometry import analytic
        for a in self._analytic:
            kind, rot, trans, r, h = a[0], a[1], a[2], a[3], a[4]
            if kind == analytic.PLANE:
                continue  # infinite (``plane.rs:113-118``)
            # conservative: local AABB corners → world
            if kind == analytic.DISK:
                cl = np.array([[-r, -r, 0.0], [r, r, 0.0]])
            elif kind == analytic.SPHERE:
                cl = np.array([[-r, -r, -r], [r, r, r]])
            else:
                cl = np.array([[-r, 0.0, -r], [r, h, r]])
            corners = np.array([[cl[i, 0], cl[j, 1], cl[k, 2]]
                                for i in (0, 1) for j in (0, 1) for k in (0, 1)])
            # local→world is rot⁻¹ (== rotᵀ only for the rigid kinds;
            # the ellipsoid frame is general affine)
            world = corners @ np.linalg.inv(rot).T + trans
            lo = np.minimum(lo, world.min(axis=0))
            hi = np.maximum(hi, world.max(axis=0))
        for geom, insts in self._inst_groups:
            if not len(geom["a"]):
                continue
            gl = np.minimum.reduce([geom[k].min(axis=0)
                                    for k in ("a", "b", "c")])
            gh = np.maximum.reduce([geom[k].max(axis=0)
                                    for k in ("a", "b", "c")])
            corners = np.array([[(gl, gh)[i][0], (gl, gh)[j][1],
                                 (gl, gh)[k][2]]
                                for i in (0, 1) for j in (0, 1)
                                for k in (0, 1)])
            for m, _ in insts:
                w = corners @ m[:3, :3].T + m[:3, 3]
                lo = np.minimum(lo, w.min(axis=0))
                hi = np.maximum(hi, w.max(axis=0))
        if not np.isfinite(lo).all():
            lo, hi = -np.ones(3), np.ones(3)
        return lo, hi


def _build_alias(powers: np.ndarray):
    """Walker alias table (host, numpy). Returns (pdf, accept_p, alias)."""
    n = len(powers)
    total = powers.sum()
    if total <= 0.0:
        pdf = np.full(n, 1.0 / n)
    else:
        pdf = powers / total
    accept = np.ones(n)
    alias = np.arange(n)
    scaled = pdf * n
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    scaled = scaled.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        accept[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] + scaled[s] - 1.0
        (large if scaled[l] >= 1.0 else small).append(l)
    for i in small + large:
        accept[i] = 1.0
    return pdf, accept, alias
