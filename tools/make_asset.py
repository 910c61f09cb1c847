"""Generate the committed end-to-end parser asset ``scenes/demo.zip``:
a genuine multi-material .obj (torus + icosphere + ground, shared vertex
pool, per-group usemtl) with a .mtl library referencing Kd/Ke/bump PNG
textures — the full reference parser surface (``parser.rs:125-201``,
``obj.rs``, ``mtl.rs``) in one artifact.  Deterministic: re-running
reproduces the same zip (fixed seed, no timestamps).
"""
import io
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _torus(R=1.0, r=0.35, nu=48, nv=24):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (R + r * np.cos(vv)) * np.cos(uu)
    y = r * np.sin(vv)
    z = (R + r * np.cos(vv)) * np.sin(uu)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    cx = np.cos(uu) * np.cos(vv)
    cy = np.sin(vv)
    cz = np.sin(uu) * np.cos(vv)
    normals = np.stack([cx, cy, cz], -1).reshape(-1, 3)
    uvs = np.stack([uu / (2 * np.pi), vv / (2 * np.pi)], -1).reshape(-1, 2)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append([a, b, c, d])      # quads: exercises fan split
    return verts, normals, uvs, np.asarray(faces)


def _icosphere(subdiv=3):
    from lumo_tpu.scene import shapes
    v, f, vn = shapes.blob(subdiv=subdiv, seed=0, amp=0.0)
    v = np.asarray(v)
    uv = np.stack([0.5 + np.arctan2(v[:, 2], v[:, 0]) / (2 * np.pi),
                   0.5 + np.arcsin(np.clip(v[:, 1] / np.maximum(
                       np.linalg.norm(v, axis=1), 1e-9), -1, 1)) / np.pi],
                  -1)
    return v, np.asarray(vn), uv, np.asarray(f)


def _png_bytes(img):
    from PIL import Image
    lin = np.clip(np.asarray(img, np.float64), 0.0, 1.0)
    srgb = np.where(lin <= 0.0031308, lin * 12.92,
                    1.055 * lin ** (1 / 2.4) - 0.055)
    u8 = (srgb * 255.0 + 0.5).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="PNG")
    return buf.getvalue()


def build_zip(path):
    rng = np.random.default_rng(7)
    # textures: checker Kd, noise bump, warm Ke
    n = 64
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    checker = (((xx // 8) + (yy // 8)) % 2).astype(np.float32)
    kd_img = np.stack([0.2 + 0.6 * checker, 0.5 - 0.3 * checker,
                       0.25 + 0.1 * checker], -1)
    bump = rng.random((n, n, 1)).astype(np.float32) * np.ones((1, 1, 3))
    ke = np.stack([np.full((n, n), 1.0), np.full((n, n), 0.8),
                   np.full((n, n), 0.5)], -1).astype(np.float32)

    mtl = """# demo material library
newmtl checker
Kd 1.0 1.0 1.0
map_Kd checker.png
bump bumpy.png

newmtl gold
Ks 0.95 0.73 0.25
Ns 600
illum 3

newmtl glowpanel
Ke 4.0 4.0 4.0
map_Ke glow.png

newmtl glassy
Tf 0.95 0.98 0.99
Ns 2000
illum 7
"""

    lines = ["# demo multi-material scene", "mtllib demo.mtl"]
    vbase, nbase, tbase = 1, 1, 1

    def emit(name, verts, normals, uvs, faces, offset, scale=1.0):
        nonlocal vbase, nbase, tbase
        lines.append(f"o {name}")
        for p in verts * scale + offset:
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
        for nn in normals:
            lines.append(f"vn {nn[0]:.6f} {nn[1]:.6f} {nn[2]:.6f}")
        for t in uvs:
            lines.append(f"vt {t[0]:.6f} {t[1]:.6f}")
        grp = name.split("_", 1)[0]
        lines.append(f"usemtl {grp}")
        for f in faces:
            toks = " ".join(f"{i + vbase}/{i + tbase}/{i + nbase}"
                            for i in f)
            lines.append(f"f {toks}")
        vbase += len(verts)
        nbase += len(normals)
        tbase += len(uvs)

    tv, tn, tt, tf = _torus()
    emit("gold_torus", tv, tn, tt, tf, np.array([0.0, -0.35, -2.2]),
         scale=0.55)
    sv, sn, st, sf = _icosphere()
    emit("checker_ball", sv, sn, st, sf, np.array([-0.55, -0.4, -1.5]),
         scale=0.4)
    emit("glassy_ball", sv, sn, st, sf, np.array([0.55, -0.45, -1.4]),
         scale=0.35)
    # glowing ceiling quad + ground quad (negative indices: relative form)
    gv = np.array([[-2, -0.8, -3.0], [2, -0.8, -3.0], [2, -0.8, 0.5],
                   [-2, -0.8, 0.5]])
    gn = np.tile([[0.0, 1.0, 0.0]], (4, 1))
    gt = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float64)
    # winding chosen so the geometric normal faces UP (toward viewers)
    emit("checker_ground", gv, gn, gt, np.array([[0, 3, 2, 1]]),
         np.zeros(3))
    lv = np.array([[-0.6, 0.95, -2.4], [0.6, 0.95, -2.4],
                   [0.6, 0.95, -1.2], [-0.6, 0.95, -1.2]])
    ln = np.tile([[0.0, -1.0, 0.0]], (4, 1))
    lt = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    # winding: geometric normal DOWN so the panel emits into the scene
    emit("glowpanel_light", lv, ln, lt, np.array([[0, 1, 2, 3]]),
         np.zeros(3))

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        # fixed date_time keeps the artifact byte-stable
        def put(name, data):
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
        put("demo.obj", "\n".join(lines) + "\n")
        put("demo.mtl", mtl)
        put("checker.png", _png_bytes(kd_img))
        put("bumpy.png", _png_bytes(bump))
        put("glow.png", _png_bytes(ke))
    with open(path, "wb") as f:
        f.write(zbuf.getvalue())
    print(f"wrote {path} ({len(zbuf.getvalue())} bytes)")


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "demo.zip")
    build_zip(out)
