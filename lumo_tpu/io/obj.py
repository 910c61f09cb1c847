"""Wavefront .obj / .mtl ingestion (host-side).

Counterpart of reference ``src/parser/{obj,mtl}.rs`` + ``src/parser.rs``:
vertices/normals/uvs with negative indices, polygon fan-triangulation,
``usemtl``/``g``/``o`` grouping (emissive groups become per-triangle
lights through the SceneBuilder's light bookkeeping), .mtl microfacet
configs with the Blender ``Ns`` roughness mapping and illum 5/6/7
fresnel/transparency flags, URL download with on-disk cache and zip
extraction.  Parsing is numpy-vectorized per element type — one pass
splits the file into typed line groups, then each group parses as a
batch (the reference parallelizes .mtl texture decode over a thread
pool instead, ``mtl.rs:100-147``).
"""
from __future__ import annotations

import dataclasses
import io
import os
import re
import zipfile
from typing import Optional

import numpy as np

from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder

CACHE_DIR = "./scenes"


# ---------------------------------------------------------------------------
# .mtl

@dataclasses.dataclass
class MtlConfig:
    """Mirror of reference ``MtlConfig`` (``mtl.rs:10-57``)."""
    Kd: tuple = (0.0, 0.0, 0.0)
    Ks: tuple = (0.0, 0.0, 0.0)
    Ke: tuple = (0.0, 0.0, 0.0)
    Tf: tuple = (0.0, 0.0, 0.0)
    eta: float = 1.5
    k: float = 0.0
    roughness: float = 1.0
    fresnel_enabled: bool = False
    is_transparent: bool = False
    map_Kd: Optional[str] = None
    map_Ks: Optional[str] = None
    map_Ke: Optional[str] = None
    map_Bump: Optional[str] = None

    def build_material(self, textures=None, normal_maps=None) -> Material:
        """Reference ``MtlConfig::build_material`` (``mtl.rs:60-91``).
        `textures`/`normal_maps` map a path → registered id (or None)."""
        tex = lambda p: -1 if (textures is None or p is None) else textures.get(p, -1)
        nm = (-1 if (normal_maps is None or self.map_Bump is None)
              else normal_maps.get(self.map_Bump, -1))
        if any(v != 0.0 for v in self.Ke) or self.map_Ke is not None:
            ke = self.Ke if any(v != 0.0 for v in self.Ke) else (1.0, 1.0, 1.0)
            return Material.light(ke, ke_tex=tex(self.map_Ke))
        return Material.microfacet(
            self.roughness, self.eta, self.k,
            self.is_transparent, self.fresnel_enabled,
            self.Kd, self.Ks, self.Tf,
            kd_tex=tex(self.map_Kd), ks_tex=tex(self.map_Ks), nm_tex=nm)


def parse_mtl(text: str, map_ks: bool = True) -> dict:
    """Parse .mtl source → {name: MtlConfig} (reference ``mtl/task.rs``)."""
    mtls: dict[str, MtlConfig] = {}
    cur: Optional[MtlConfig] = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        tok = line.split()
        cmd = tok[0]
        if cmd == "newmtl":
            cur = MtlConfig()
            mtls[tok[1]] = cur
        elif cur is None:
            continue
        elif cmd == "Kd":
            cur.Kd = tuple(float(x) for x in tok[1:4])
        elif cmd == "Ks":
            cur.Ks = tuple(float(x) for x in tok[1:4])
        elif cmd == "Ke":
            cur.Ke = tuple(float(x) for x in tok[1:4])
        elif cmd == "Tf":
            cur.Tf = tuple(float(x) for x in tok[1:4])
        elif cmd == "Ni":
            cur.eta = float(tok[1])
        elif cmd == "Ns":
            # Blender mapping (reference ``mtl/task.rs:93-99``)
            cur.roughness = 1.0 - min(float(tok[1]), 900.0) ** 0.5 / 30.0
        elif cmd == "illum":
            illum = int(float(tok[1]))
            if illum == 5:
                cur.fresnel_enabled = True
            elif illum == 6:
                cur.is_transparent = True
            elif illum == 7:
                cur.fresnel_enabled = True
                cur.is_transparent = True
        elif cmd == "map_Kd":
            cur.map_Kd = " ".join(tok[1:]).replace("\\", "/")
        elif cmd == "map_Ks":
            # when the loader runs with map_ks=False this names an ORM
            # texture; ``scene_from_file`` decodes it and feeds its
            # channel means into roughness/metalness (``mtl/task.rs:55-70``)
            cur.map_Ks = " ".join(tok[1:]).replace("\\", "/")
        elif cmd == "map_Ke":
            cur.map_Ke = " ".join(tok[1:]).replace("\\", "/")
        elif cmd in ("map_Bump", "map_bump", "bump"):
            cur.map_Bump = " ".join(tok[1:]).replace("\\", "/")
    return mtls


# ---------------------------------------------------------------------------
# .obj

_FACE_SPLIT = re.compile(r"/")


def _parse_idx(s: str, n: int) -> int:
    i = int(s)
    return i - 1 if i > 0 else n + i


def parse_obj(text: str):
    """Single-pass .obj parse.

    Returns (vertices (V,3), normals (Vn,3), uvs (Vt,2), groups) where
    groups is a list of (mtl_name | None, faces (F,3), nidx (F,3) | None,
    tidx (F,3) | None)."""
    v_lines, vn_lines, vt_lines = [], [], []
    # (mtl_name, face token lists)
    groups: list[tuple[Optional[str], list]] = [(None, [])]
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        c0 = line[0]
        if c0 == "v":
            if line.startswith("v "):
                v_lines.append(line[2:])
            elif line.startswith("vn "):
                vn_lines.append(line[3:])
            elif line.startswith("vt "):
                vt_lines.append(line[3:])
        elif c0 == "f":
            groups[-1][1].append(line.split()[1:])
        elif line.startswith(("g", "o")):
            if groups[-1][1]:
                groups.append((groups[-1][0], []))
        elif line.startswith("usemtl"):
            name = line.split(None, 1)[1].strip()
            if groups[-1][1]:
                groups.append((name, []))
            else:
                groups[-1] = (name, groups[-1][1])

    def farr(lines, d):
        if not lines:
            return np.zeros((0, d))
        a = np.array(" ".join(lines).split(), np.float64)
        if len(a) == len(lines) * d:      # fast path: uniform arity
            return a.reshape(-1, d)
        return np.array([l.split()[:d] for l in lines], np.float64)

    verts = farr(v_lines, 3)
    normals = farr(vn_lines, 3)
    if len(normals):
        nl = np.linalg.norm(normals, axis=-1, keepdims=True)
        deg = nl[:, 0] < 1e-12
        normals = np.where(deg[:, None], [0.0, 0.0, 1.0], normals / np.maximum(nl, 1e-30))
    uvs = farr(vt_lines, 2)

    out = []
    for name, face_tokens in groups:
        if not face_tokens:
            continue
        fv, fn, ft = [], [], []
        for corners in face_tokens:
            parsed = []
            for tokn in corners:
                parts = tokn.split("/")
                vi = _parse_idx(parts[0], len(verts))
                ti = (_parse_idx(parts[1], len(uvs))
                      if len(parts) > 1 and parts[1] else -1)
                ni = (_parse_idx(parts[2], len(normals))
                      if len(parts) > 2 and parts[2] else -1)
                parsed.append((vi, ti, ni))
            # fan triangulation (reference ``obj.rs:175-196``)
            for i in range(1, len(parsed) - 1):
                a, b, c = parsed[0], parsed[i], parsed[i + 1]
                fv.append((a[0], b[0], c[0]))
                ft.append((a[1], b[1], c[1]))
                fn.append((a[2], b[2], c[2]))
        fv = np.asarray(fv, np.int64)
        fn = np.asarray(fn, np.int64)
        ft = np.asarray(ft, np.int64)
        has_n = len(normals) > 0 and (fn >= 0).all()
        has_t = len(uvs) > 0 and (ft >= 0).all()
        out.append((name, fv, fn if has_n else None, ft if has_t else None))
    return verts, normals, uvs, out


# ---------------------------------------------------------------------------
# entry points (reference ``parser.rs:125-201``)

def _read(source) -> str:
    if hasattr(source, "read"):
        data = source.read()
        return data.decode() if isinstance(data, bytes) else data
    with open(source, "rb") as f:
        return f.read().decode(errors="replace")


def mesh_from_file(source, material: Material, builder: SceneBuilder = None,
                   transform=None) -> SceneBuilder:
    """Load an .obj as one mesh with a single material
    (reference ``parser::mesh_from_path``)."""
    b = builder or SceneBuilder()
    verts, normals, uvs, groups = parse_obj(_read(source))
    mid = b.material(material)
    for _, fv, fn, ft in groups:
        b.add_triangles(verts, fv, mid,
                        normals=normals if fn is not None else None,
                        vertex_normal_idx=fn,
                        uvs=uvs if ft is not None else None, uv_idx=ft,
                        transform=transform)
    return b


def scene_from_file(obj_source, mtl_source=None, builder: SceneBuilder = None,
                    default_material: Material = None,
                    resolve=None, map_ks: bool = True) -> SceneBuilder:
    """Load an .obj with its .mtl library: per-``usemtl`` sub-meshes,
    emissive groups as lights (reference ``obj::load_scene``).

    `resolve(path)` returns a file-like for a texture path referenced by
    the .mtl (e.g. out of a zip) — texture maps load through it.
    ``map_ks=False`` treats ``map_Ks`` as an ORM texture
    (occlusion/roughness/metalness): its channel means feed
    roughness/metalness and Ks becomes white instead of registering a
    specular texture (reference ``mtl/task.rs:55-70``)."""
    b = builder or SceneBuilder()
    mtls = parse_mtl(_read(mtl_source)) if mtl_source is not None else {}
    textures: dict[str, int] = {}
    normal_maps: dict[str, int] = {}
    if resolve is not None:
        from concurrent.futures import ThreadPoolExecutor

        from lumo_tpu.io import image as image_io

        # decode every referenced image on a 4-worker pool (reference
        # ``mtl.rs:100-147`` runs MtlTasks on a 4-thread pool)
        tex_paths, orm_paths, bump_paths = set(), set(), set()
        for cfg in mtls.values():
            maps = ((cfg.map_Kd, cfg.map_Ks, cfg.map_Ke) if map_ks
                    else (cfg.map_Kd, cfg.map_Ke))
            tex_paths.update(p for p in maps if p)
            if not map_ks and cfg.map_Ks:
                orm_paths.add(cfg.map_Ks)
            if cfg.map_Bump:
                bump_paths.add(cfg.map_Bump)

        def _dec(path, kind):
            src = resolve(path)
            if src is None:
                return path, kind, None
            if kind == "bump":
                return path, kind, image_io.bump_to_normal_map(src)
            return path, kind, image_io.load_png(src)

        jobs = ([(p, "tex") for p in sorted(tex_paths)]
                + [(p, "orm") for p in sorted(orm_paths)]
                + [(p, "bump") for p in sorted(bump_paths)])
        with ThreadPoolExecutor(max_workers=4) as pool:
            decoded = list(pool.map(lambda a: _dec(*a), jobs))
        orm_means = {}
        for path, kind, img in decoded:
            if img is None:
                continue
            if kind == "tex":
                textures[path] = b.textures.image(img)
            elif kind == "bump":
                normal_maps[path] = b.textures.normal_map(img)
            else:
                orm_means[path] = np.asarray(img, np.float64).reshape(
                    -1, img.shape[-1]).mean(axis=0)
        if not map_ks:
            for cfg in mtls.values():
                orm = orm_means.get(cfg.map_Ks)
                if orm is not None:
                    # occlusion, roughness, metalness channels
                    cfg.roughness = float(orm[1])
                    cfg.k = float(orm[2])
                    cfg.Ks = (1.0, 1.0, 1.0)
                    cfg.map_Ks = None
    mat_ids: dict[str, int] = {}
    for name, cfg in mtls.items():
        mat_ids[name] = b.material(cfg.build_material(textures, normal_maps))
    default_id = None
    verts, normals, uvs, groups = parse_obj(_read(obj_source))
    for name, fv, fn, ft in groups:
        if name is not None and name in mat_ids:
            mid = mat_ids[name]
        else:
            if name is not None and mtls:
                raise ValueError(f"could not find material {name}")
            if default_id is None:
                default_id = b.material(
                    default_material or Material.diffuse((0.9, 0.9, 0.9)))
            mid = default_id
        b.add_triangles(verts, fv, mid,
                        normals=normals if fn is not None else None,
                        vertex_normal_idx=fn,
                        uvs=uvs if ft is not None else None, uv_idx=ft)
    return b


def _check_cached(url: str) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    name = url.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(CACHE_DIR, name)


def _download(url: str) -> str:
    """Download with cache (reference ``parser.rs:149-165`` shells out to
    curl; here urllib — note this image has no network egress, so only the
    cache path is exercised in CI)."""
    path = _check_cached(url)
    if os.path.exists(path):
        return path
    import urllib.request
    with urllib.request.urlopen(url, timeout=60) as r, open(path, "wb") as f:
        f.write(r.read())
    return path


def _zip_member(zf: zipfile.ZipFile, suffix: str) -> Optional[str]:
    for n in zf.namelist():
        if n.endswith(suffix):
            return n
    return None


def scene_from_url(url: str, builder: SceneBuilder = None) -> SceneBuilder:
    """Download (or use cached) zip/.obj and build the scene
    (reference ``parser::scene_from_url``)."""
    path = _download(url)
    if path.endswith(".zip"):
        with open(path, "rb") as f:
            return scene_from_zip(f.read(), builder)
    with open(path, "rb") as f:
        return scene_from_file(io.BytesIO(f.read()), builder=builder)


def scene_from_zip(zip_bytes: bytes, builder: SceneBuilder = None) -> SceneBuilder:
    """Extract .obj + .mtl from a zip archive by suffix
    (reference ``parser.rs:88-114``)."""
    zf = zipfile.ZipFile(io.BytesIO(zip_bytes))
    obj_name = _zip_member(zf, ".obj")
    if obj_name is None:
        raise ValueError("no .obj in zip")
    mtl_name = _zip_member(zf, ".mtl")
    obj = io.BytesIO(zf.read(obj_name))
    mtl = io.BytesIO(zf.read(mtl_name)) if mtl_name else None

    def resolve(path):
        m = _zip_member(zf, path.rsplit("/", 1)[-1])
        return io.BytesIO(zf.read(m)) if m else None

    return scene_from_file(obj, mtl, builder=builder, resolve=resolve)


def mesh_from_url(url: str, material: Material,
                  builder: SceneBuilder = None) -> SceneBuilder:
    path = _download(url)
    if path.endswith(".zip"):
        with open(path, "rb") as f:
            zf = zipfile.ZipFile(io.BytesIO(f.read()))
        obj_name = _zip_member(zf, ".obj")
        return mesh_from_file(io.BytesIO(zf.read(obj_name)), material, builder)
    return mesh_from_file(path, material, builder)


def texture_from_url(url: str, builder: SceneBuilder):
    """Download (with ./scenes/ cache) an image — optionally inside a
    .zip — decode it, and register it in ``builder.textures``; returns
    the texture id for ``Material(..., kd_tex=id)``
    (reference ``parser.rs:177-182``)."""
    from lumo_tpu.io import image as image_mod

    def _dec(name, data):
        src = io.BytesIO(data)
        if name.lower().endswith(".hdr"):
            return image_mod.load_hdr(src)
        return image_mod.load_png(src)

    path = _download(url)
    if path.endswith(".zip"):
        with open(path, "rb") as f:
            zf = zipfile.ZipFile(io.BytesIO(f.read()))
        name = None
        for suffix in (".png", ".hdr", ".jpg", ".jpeg"):
            name = _zip_member(zf, suffix)
            if name:
                break
        if name is None:
            raise ValueError(f"no image inside {url}")
        rgb = _dec(name, zf.read(name))
    else:
        with open(path, "rb") as f:
            rgb = _dec(path, f.read())
    return builder.textures.image(rgb)
