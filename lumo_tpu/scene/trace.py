"""Device-side scene queries: intersection, occlusion, light sampling,
emission — all vectorized over ray wavefronts.

Brute-force dense intersection is used for small scenes (every ray tests
every primitive — VPU-friendly and exact); large scenes switch to the BVH
wavefront traversal in ``lumo_tpu.accel``.  Counterpart of reference
``src/tracer/scene.rs`` (hit / hit_light / transmittance) and the
Sampleable light methods (``object.rs:96-157``, ``triangle.rs:215-241``,
``sphere.rs:135-207``).
"""
from __future__ import annotations

import jax.numpy as jnp

from lumo_tpu.color import dense, uplift
from lumo_tpu.config import INF
from lumo_tpu.geometry import intersect as geo
from lumo_tpu.geometry.onb import dot, normalize, onb_frame
from lumo_tpu.scene.materials import LIGHT
from lumo_tpu.scene.scene import SceneData

PI = jnp.pi


# ---------------------------------------------------------------------------
# intersection

def _all_t(scene: SceneData, o, d, t_min, t_max):
    """(N, P) candidate t's over all primitives."""
    parts = []
    if scene.n_tris:
        kz, shear = geo.ray_setup(d)
        t_tri, _, _ = geo.triangle_t(
            o, kz, shear, scene.tri_a[None], scene.tri_b[None], scene.tri_c[None],
            t_min, t_max)
        parts.append(t_tri)
    if scene.n_spheres:
        t_sph = geo.sphere_t(o, d, scene.sph_center[None], scene.sph_radius[None],
                             t_min, t_max)
        parts.append(t_sph)
    if not parts:
        return jnp.full(o.shape[:-1] + (1,), INF, o.dtype)
    return jnp.concatenate(parts, axis=-1)


def _closest(scene: SceneData, o, d, t_max):
    """(t, global prim id) closest hit; BVH traversal for triangles when
    built, dense otherwise; spheres always dense (they are few)."""
    N = o.shape[0]
    if scene.bvh is not None:
        from lumo_tpu.accel import traverse
        t_tri, p_tri = traverse.closest_hit(
            scene.bvh, (scene.tri_a, scene.tri_b, scene.tri_c), o, d,
            t_max=t_max)
        t, prim = t_tri, jnp.where(p_tri < 0, 0, p_tri)
        if scene.n_spheres:
            t_sph = geo.sphere_t(o, d, scene.sph_center[None],
                                 scene.sph_radius[None], 0.0, t_max)
            js = jnp.argmin(t_sph, axis=-1).astype(jnp.int32)
            ts = jnp.take_along_axis(t_sph, js[..., None], axis=-1)[..., 0]
            better = ts < t
            t = jnp.minimum(t, ts)
            prim = jnp.where(better, scene.n_tris + js, prim)
        return t, prim
    ts = _all_t(scene, o, d, 0.0, t_max)
    prim = jnp.argmin(ts, axis=-1).astype(jnp.int32)
    t = jnp.take_along_axis(ts, prim[..., None], axis=-1)[..., 0]
    return t, prim


def intersect(scene: SceneData, o, d, t_max=None):
    """Closest hit for a wavefront. o, d: (N, 3). Returns a hit dict."""
    N = o.shape[0]
    if t_max is None:
        t_max = INF
    t, prim = _closest(scene, o, d, t_max)
    valid = jnp.isfinite(t)

    T = scene.n_tris
    is_tri = prim < T if T else jnp.zeros(N, bool)
    tidx = jnp.clip(prim, 0, max(T - 1, 0))
    sidx = jnp.clip(prim - T, 0, max(scene.n_spheres - 1, 0))

    if T:
        g = lambda arr: arr[tidx]
        dt = geo.triangle_detail(o, d, g(scene.tri_a), g(scene.tri_b), g(scene.tri_c),
                                 g(scene.tri_na), g(scene.tri_nb), g(scene.tri_nc),
                                 g(scene.tri_uva), g(scene.tri_uvb), g(scene.tri_uvc))
        mat_tri = scene.tri_mat[tidx]
    if scene.n_spheres:
        ds = geo.sphere_detail(o, d, t, scene.sph_center[sidx], scene.sph_radius[sidx])
        mat_sph = scene.sph_mat[sidx]

    if T and scene.n_spheres:
        pick = lambda a, b: jnp.where(is_tri[..., None] if a.ndim == 2 else is_tri, a, b)
        det = {k: pick(dt[k], ds[k]) for k in dt}
        mat = jnp.where(is_tri, mat_tri, mat_sph)
    elif T:
        det, mat = dt, mat_tri
    else:
        det, mat = ds, mat_sph

    backface = dot(d, det["ng"]) > 0.0
    # normal mapping: perturb ns in its per-hit ONB
    # (reference ``material.rs:324-331``)
    if scene.n_normal_maps:
        from lumo_tpu import texture as texture_mod
        from lumo_tpu.geometry import onb as onb_mod
        nm = scene.materials["nm_tex"][mat]
        n_tan = texture_mod.normal_at(scene.textures, nm, det["uv"])
        ns2 = normalize(onb_mod.to_world(det["ns"], n_tan))
        det["ns"] = jnp.where((nm >= 0)[..., None], ns2, det["ns"])
    return {
        "valid": valid, "t": jnp.where(valid, t, INF), "prim": prim, "mat": mat,
        "p": det["p"], "ng": det["ng"], "ns": det["ns"], "uv": det["uv"],
        "err": det["err"], "backface": backface,
        "light": scene.prim_light[jnp.clip(prim, 0, scene.prim_light.shape[0] - 1)],
        "is_medium": jnp.zeros(N, bool),
    }


def occluded(scene: SceneData, o, d, t_max):
    """Any-hit within (0, t_max). t_max: (N,)."""
    if scene.bvh is not None:
        from lumo_tpu.accel import traverse
        occ = traverse.any_hit(scene.bvh, (scene.tri_a, scene.tri_b, scene.tri_c),
                               o, d, t_max=t_max)
        if scene.n_spheres:
            t_sph = geo.sphere_t(o, d, scene.sph_center[None],
                                 scene.sph_radius[None], 0.0, t_max[..., None])
            occ = occ | jnp.any(jnp.isfinite(t_sph), axis=-1)
        return occ
    ts = _all_t(scene, o, d, 0.0, t_max[..., None])
    return jnp.any(jnp.isfinite(ts), axis=-1)


# ---------------------------------------------------------------------------
# emission (reference ``material.rs:223-234``)

def emitted(scene: SceneData, mat, lam, uv, backface):
    """Emitted radiance (N, 4) of material ids `mat` at wavelengths `lam`."""
    m = scene.materials
    ke = uplift.sample(m["ke"][mat][..., None, :], lam)         # (N, 4)
    if scene.textures is not None:
        from lumo_tpu import texture as texture_mod
        tid = m["ke_tex"][mat]
        val = texture_mod.albedo(scene.textures, tid, lam, uv,
                                 kinds=scene.tex_kinds)
        ke = jnp.where((tid >= 0)[..., None], val, ke)
    illum = dense.sample_rows(m["illum"], mat, lam)
    scale = m["emit_scale"][mat][..., None]
    is_light = (m["kind"][mat] == LIGHT)[..., None]
    visible = (m["two_sided"][mat] | ~backface)[..., None]
    return jnp.where(is_light & visible, scale * ke * illum, 0.0)


# ---------------------------------------------------------------------------
# light sampling (NEE)

def sample_light(scene: SceneData, u):
    """O(1) alias-table lookup: uniform u (N,) → (light_idx, pdf)
    (reference ``bvh.rs:67-77``)."""
    L = scene.n_lights
    x = u * L
    idx = jnp.clip(x.astype(jnp.int32), 0, L - 1)
    frac = x - idx.astype(x.dtype)
    accept = frac < scene.alias_p[idx]
    light = jnp.where(accept, idx, scene.alias_idx[idx])
    return light, scene.light_pdf[light]


def _light_geom(scene: SceneData, light):
    """Gather the chosen light's primitive data. Returns dict with
    is_tri, tri (a,b,c), sphere (center, radius), mat."""
    prim = scene.light_prim[light]
    T = scene.n_tris
    is_tri = prim < T if T else jnp.zeros(light.shape, bool)
    tidx = jnp.clip(prim, 0, max(T - 1, 0))
    sidx = jnp.clip(prim - T, 0, max(scene.n_spheres - 1, 0))
    out = {"prim": prim, "is_tri": is_tri}
    if T:
        out["a"] = scene.tri_a[tidx]
        out["b"] = scene.tri_b[tidx]
        out["c"] = scene.tri_c[tidx]
        out["mat_tri"] = scene.tri_mat[tidx]
    if scene.n_spheres:
        out["center"] = scene.sph_center[sidx]
        out["radius"] = scene.sph_radius[sidx]
        out["mat_sph"] = scene.sph_mat[sidx]
    return out


def sample_towards(scene: SceneData, light, xo, u):
    """Sample direction from xo (N,3) towards light `light` (N,) using
    u (N,2).  Triangles: sqrt-warp area sampling (``triangle.rs:219-241``);
    spheres: visible-cone sampling (``sphere.rs:135-186``)."""
    g = _light_geom(scene, light)
    wi = None
    if scene.n_tris:
        gamma = 1.0 - jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0]))
        beta = u[..., 1] * (1.0 - gamma)
        xi = g["a"] + beta[..., None] * (g["b"] - g["a"]) + gamma[..., None] * (g["c"] - g["a"])
        wi_tri = normalize(xi - xo)
    if scene.n_spheres:
        rel = xo - g["center"]
        dist2 = jnp.sum(rel * rel, axis=-1)
        r2 = g["radius"] ** 2
        inside = dist2 < r2
        # cone sample (outside)
        w = normalize(-rel)
        ub, vb = onb_frame(w)
        dist = jnp.sqrt(dist2)
        sin2_max = r2 / jnp.maximum(dist2, 1e-30)
        cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
        cos_t = (1.0 - u[..., 0]) + u[..., 0] * cos_max
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t ** 2))
        phi = 2.0 * PI * u[..., 1]
        ds_ = dist * cos_t - jnp.sqrt(jnp.maximum(0.0, r2 - dist2 * sin_t ** 2))
        cos_a = (dist2 + r2 - ds_ ** 2) / (2.0 * dist * g["radius"] + 1e-30)
        sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a ** 2))
        ngl = (jnp.cos(phi) * sin_a)[..., None] * ub \
            + (jnp.sin(phi) * sin_a)[..., None] * vb \
            + cos_a[..., None] * w
        xi_out = g["center"] - normalize(ngl) * g["radius"][..., None]
        # inside: uniform surface sample
        z = 1.0 - 2.0 * u[..., 0]
        rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        sph = jnp.stack([rr * jnp.cos(2 * PI * u[..., 1]),
                         rr * jnp.sin(2 * PI * u[..., 1]), z], axis=-1)
        xi_in = g["center"] + sph * g["radius"][..., None]
        xi_s = jnp.where(inside[..., None], xi_in, xi_out)
        wi_sph = normalize(xi_s - xo)
    if scene.n_tris and scene.n_spheres:
        wi = jnp.where(g["is_tri"][..., None], wi_tri, wi_sph)
    elif scene.n_tris:
        wi = wi_tri
    else:
        wi = wi_sph
    return wi


def light_hit(scene: SceneData, light, o, d):
    """Intersect ray with its chosen light primitive only.  Returns hit
    dict (valid, t, p, ng, backface, mat, uv) — the wavefront version of
    ``light.hit(r)`` inside ``scene.hit_light`` (``scene.rs:165-189``)."""
    g = _light_geom(scene, light)
    if scene.n_tris:
        kz, shear = geo.ray_setup(d)
        t_tri, _, _ = geo.triangle_t(o, kz, shear, g["a"][:, None], g["b"][:, None],
                                     g["c"][:, None], 0.0, INF)
        t_tri = t_tri[:, 0]
        zero2 = jnp.zeros(g["a"].shape[:-1] + (2,), o.dtype)
        dt = geo.triangle_detail(o, d, g["a"], g["b"], g["c"],
                                 jnp.zeros_like(g["a"]), jnp.zeros_like(g["a"]),
                                 jnp.zeros_like(g["a"]), zero2, zero2, zero2)
    if scene.n_spheres:
        t_sph = geo.sphere_t(o, d, g["center"][:, None], g["radius"][:, None], 0.0, INF)[:, 0]
        ds = geo.sphere_detail(o, d, t_sph, g["center"], g["radius"])
    if scene.n_tris and scene.n_spheres:
        is_tri = g["is_tri"]
        t = jnp.where(is_tri, t_tri, t_sph)
        det = {k: jnp.where(is_tri[..., None] if dt[k].ndim == 2 else is_tri,
                            dt[k], ds[k]) for k in ("p", "ng", "uv")}
        mat = jnp.where(is_tri, g["mat_tri"], g["mat_sph"])
    elif scene.n_tris:
        t, mat = t_tri, g["mat_tri"]
        det = dt
    else:
        t, mat = t_sph, g["mat_sph"]
        det = ds
    valid = jnp.isfinite(t)
    backface = dot(d, det["ng"]) > 0.0
    return {"valid": valid, "t": t, "p": det["p"], "ng": det["ng"],
            "uv": det["uv"], "mat": mat, "backface": backface}


def sample_towards_pdf(scene: SceneData, light, o, d, xi, ng):
    """PDF w.r.t. solid angle of `sample_towards` for ray (o, d) reaching
    xi with light normal ng (reference ``object.rs:141-157``,
    ``sphere.rs:190-207``)."""
    g = _light_geom(scene, light)
    dist2 = jnp.sum((xi - o) ** 2, axis=-1)
    cos_l = jnp.abs(dot(ng, d))
    # edge-on lights: pdf → ∞; zero it so the MIS mask drops the sample
    # (its contribution → 0 anyway)
    cos_ok = cos_l > 1e-7
    if scene.n_tris:
        area = 0.5 * jnp.linalg.norm(
            jnp.cross(g["b"] - g["a"], g["c"] - g["a"]), axis=-1)
        pdf_tri = jnp.where(cos_ok, dist2 / jnp.maximum(area * cos_l, 1e-30), 0.0)
    if scene.n_spheres:
        rel = o - g["center"]
        do2 = jnp.sum(rel * rel, axis=-1)
        r2 = g["radius"] ** 2
        inside = do2 < r2
        area_s = 4.0 * PI * r2
        pdf_in = jnp.where(cos_ok, dist2 / jnp.maximum(area_s * cos_l, 1e-30), 0.0)
        sin2_max = r2 / jnp.maximum(do2, 1e-30)
        cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
        pdf_out = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_max), 1e-30)
        pdf_sph = jnp.where(inside, pdf_in, pdf_out)
    if scene.n_tris and scene.n_spheres:
        return jnp.where(g["is_tri"], pdf_tri, pdf_sph)
    return pdf_tri if scene.n_tris else pdf_sph


def transmittance(scene: SceneData, lam, t):
    """Medium transmittance along distance t — identity until volumetric
    media land (reference ``scene.rs:111-116``)."""
    return jnp.ones(lam.shape, lam.dtype)
