"""Analytic primitives: infinite plane, disk, cone, cylinder.

Wavefront re-design of the reference's EFloat-robust analytic objects
(``src/tracer/object/{plane,disk,cone,cylinder}.rs``): each primitive is
stored as a rigid local frame (rotation rows + translation) plus
(radius, height) parameters, and a whole wavefront of N rays is tested
against all A primitives as dense (N, A) vectorized math — the four
shapes share one fused kernel selected by integer kind tags.

Local-space conventions (world → local: ``xl = rot @ (x - trans)``):

* PLANE    — the z = 0 plane, normal +z, infinite extent
  (``plane.rs:41-121``); uv = fract(xl), fract(yl) (the reference's
  ONB-basis fract map with u/v = the local x/y axes).
* DISK     — z = 0, ``x² + y² ≤ r²`` (``disk.rs:47-121``);
  uv = (xl/r, yl/r).
* CONE     — y-axis, base circle of radius r at y = 0, apex at
  y = height (``cone.rs:28-90``).
* CYLINDER — y-axis, base at y = 0, top at y = height, radius r
  (``cylinder.rs:28-90``); hit x/z reprojected onto the surface.

The reference's EFloat interval bounds become conservative gamma-term
epsilons on t (as in ``intersect.sphere_t``) plus PBR-style error-bound
vectors for robust secondary-ray offsets.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lumo_tpu.config import INF, epsilon, gamma_bound

PLANE = 0
DISK = 1
CONE = 2
CYLINDER = 3
# unit sphere under a general AFFINE frame — the reference's ellipsoid,
# an ``Instance<Sphere>`` with non-uniform scale (``instance.rs:81-105``:
# rays are inverse-transformed WITHOUT renormalizing the direction so t
# stays a world-space parameter)
SPHERE = 4

PI = np.pi


def _to_local(o, d, rot, trans):
    """Rays (N, 3) into the local frames of A primitives.
    rot: (A, 3, 3) world→local rows; trans: (A, 3).
    Returns ol, dl: (N, A, 3)."""
    rel = o[:, None, :] - trans[None, :, :]              # (N, A, 3)
    ol = jnp.einsum("aij,naj->nai", rot, rel)
    dl = jnp.einsum("aij,nj->nai", rot, d)
    return ol, dl


def _stable_quadratic(a, b, c):
    """Numerically stable quadratic roots (lo, hi, ok) — the f32 analog of
    the reference's ``EFloat::quadratic`` (``efloat.rs:68-84``)."""
    disc = b * b - 4.0 * a * c
    ok = (disc >= 0.0) & (jnp.abs(a) > 0.0)
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    sgn = jnp.where(b >= 0.0, 1.0, -1.0)  # sign(0) must be 1, not 0
    q = -0.5 * (b + sgn * root)
    a_safe = jnp.where(a == 0.0, 1.0, a)
    q_safe = jnp.where(q == 0.0, 1.0, q)
    t0 = q / a_safe
    t1 = jnp.where(q == 0.0, jnp.where(disc == 0.0, t0, INF), c / q_safe)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return lo, hi, ok


def analytic_t(o, d, kind, rot, trans, radius, height, t_min, t_max):
    """t-only intersection of N rays against A analytic primitives.

    o, d: (N, 3); kind: (A,) int32; rot: (A, 3, 3); trans: (A, 3);
    radius/height: (A,).  t_min/t_max scalar or (N, 1).
    Returns t: (N, A), INF on miss."""
    ol, dl = _to_local(o, d, rot, trans)
    ox, oy, oz = ol[..., 0], ol[..., 1], ol[..., 2]
    dx, dy, dz = dl[..., 0], dl[..., 1], dl[..., 2]
    kindb = kind[None, :]
    r = radius[None, :]
    h = height[None, :]
    is_planar = (kindb == PLANE) | (kindb == DISK)
    is_cone = kindb == CONE

    # ---- plane / disk: t = -oz / dz (``plane.rs:44-66``) ----
    coplanar = jnp.abs(dz) < epsilon()
    dz_safe = jnp.where(coplanar, 1.0, dz)
    t_pl = -oz / dz_safe
    px = ox + t_pl * dx
    py = oy + t_pl * dy
    in_disk = px * px + py * py <= r * r
    ok_pl = ~coplanar & ((kindb == PLANE) | in_disk)

    # ---- cone / cylinder / sphere quadratic (``cone.rs:37-69``,
    #      ``cyl.rs:40-70``, ``sphere.rs:28-74``) --
    is_sph = kindb == SPHERE
    tan2 = jnp.where(is_cone, (r / jnp.maximum(h, 1e-30)) ** 2, 0.0)
    oyh = jnp.where(is_cone, oy - h, 0.0)
    # sphere lanes add the y² terms (|ol + t·dl|² = r²); dl need not be
    # unit length — t stays the world parameter of the untransformed ray
    sph = is_sph.astype(o.dtype)
    qa = dx * dx + dz * dz - tan2 * dy * dy + sph * dy * dy
    qb = 2.0 * (dx * ox + dz * oz - tan2 * dy * oyh + sph * dy * oy)
    qc = ox * ox + oz * oz - tan2 * oyh * oyh + sph * oy * oy \
        - jnp.where(is_cone, 0.0, r * r)
    lo, hi, ok_q = _stable_quadratic(qa, qb, qc)
    # check both roots against the height clamp (``cone.rs:59-69``);
    # spheres have no clamp
    y_lo = oy + lo * dy
    y_hi = oy + hi * dy
    eps_q = 32.0 * jnp.finfo(o.dtype).eps \
        * jnp.maximum(jnp.abs(jnp.where(ok_q, hi, 1.0)), 1.0)
    in_lo = (is_sph | ((y_lo >= 0.0) & (y_lo <= h))) \
        & (lo > t_min + eps_q) & (lo < t_max)
    in_hi = (is_sph | ((y_hi >= 0.0) & (y_hi <= h))) \
        & (hi > t_min + eps_q) & (hi < t_max)
    t_q = jnp.where(ok_q & in_lo, lo, jnp.where(ok_q & in_hi, hi, INF))

    eps_pl = 32.0 * jnp.finfo(o.dtype).eps * jnp.maximum(jnp.abs(t_pl), 1.0)
    ok_pl = ok_pl & (t_pl > t_min + eps_pl) & (t_pl < t_max)
    t = jnp.where(is_planar, jnp.where(ok_pl, t_pl, INF), t_q)
    return t


def _inv3(m):
    """Batched closed-form 3×3 inverse (adjugate / det).  m: (N, 3, 3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d_, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d_ * i, a * i - c * g, c * d_ - a * f], -1),
        jnp.stack([d_ * h - e * g, b * g - a * h, a * e - b * d_], -1),
    ], -2)
    det = a * (e * i - f * h) - b * (d_ * i - f * g) + c * (d_ * h - e * g)
    det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    return co / det[..., None, None]


def analytic_detail(o, d, t, kind, rot, trans, radius, height):
    """Shading data for the already-selected analytic hit per ray.

    o, d: (N, 3); t: (N,); kind/rot/trans/radius/height gathered per ray
    ((N,), (N, 3, 3), (N, 3), (N,), (N,)).  Returns dict p/ng/ns/uv/err.
    """
    rel = o - trans
    ol = jnp.einsum("nij,nj->ni", rot, rel)
    dl = jnp.einsum("nij,nj->ni", rot, d)
    pl = ol + t[..., None] * dl
    x, y, z = pl[..., 0], pl[..., 1], pl[..., 2]
    r = jnp.maximum(radius, 1e-30)
    h = jnp.maximum(height, 1e-30)

    # normals in local space.  Unselected-kind lanes must stay FINITE,
    # not merely masked: SceneData is a differentiable pytree and a
    # jnp.where over an inf/NaN branch poisons reverse-mode gradients
    # (the standard double-where guard; ADVICE r2).
    is_cone_s = kind == CONE
    is_cyl_s = kind == CYLINDER
    is_sph_s = kind == SPHERE
    n_planar = jnp.zeros_like(pl).at[..., 2].set(1.0)
    rad_xz = jnp.sqrt(jnp.maximum(x * x + z * z, 1e-30))
    tan_th = jnp.where(is_cone_s, radius, 0.0) / h
    n_cone = jnp.stack([x, rad_xz * tan_th, z], axis=-1)
    n_cone = n_cone / jnp.maximum(
        jnp.linalg.norm(n_cone, axis=-1, keepdims=True), 1e-30)
    # cylinder: reproject x/z onto the surface (``cylinder.rs:74-82``)
    rr2 = jnp.where(is_cyl_s, radius * radius, 1.0) \
        / jnp.maximum(x * x + z * z, jnp.where(is_cyl_s, 1e-30, 1.0))
    cx = x * rr2
    cz = z * rr2
    n_cyl = jnp.stack([cx, jnp.zeros_like(y), cz], axis=-1) / r[..., None]
    # sphere: reproject onto the local unit-r sphere (``sphere.rs:63-64``)
    pl_norm = jnp.sqrt(jnp.maximum(jnp.sum(pl * pl, axis=-1), 1e-30))
    sph_scale = jnp.where(is_sph_s, r / pl_norm, 1.0)
    p_sph = pl * sph_scale[..., None]
    n_sph = p_sph / r[..., None]

    is_planar = ((kind == PLANE) | (kind == DISK))[..., None]
    is_cone = is_cone_s[..., None]
    is_cyl = is_cyl_s[..., None]
    is_sph = is_sph_s[..., None]
    nl = jnp.where(is_planar, n_planar,
                   jnp.where(is_cone, n_cone,
                             jnp.where(is_sph, n_sph, n_cyl)))
    pl_out = jnp.where(is_cyl, jnp.stack([cx, y, cz], axis=-1),
                       jnp.where(is_sph, p_sph, pl))

    # uv (``plane.rs:71-85``, ``disk.rs:85-89``, ``cone.rs:82-85``)
    # plane uv is fract of the ONB projection of the WORLD point
    # (plane.rs computes onb_u . p_world) — x/y here are relative to the
    # plane anchor, so add back the anchor's projection (ADVICE r2)
    u_pl = jnp.mod(x + jnp.einsum("ni,ni->n", rot[:, 0, :], trans), 1.0)
    v_pl = jnp.mod(y + jnp.einsum("ni,ni->n", rot[:, 1, :], trans), 1.0)
    u_dk = x / r
    v_dk = y / r
    u_rad = (jnp.arctan2(-pl_out[..., 2], pl_out[..., 0]) + PI) / (2.0 * PI)
    v_rad = y / h
    # sphere uv: spherical coords matching ``sphere_detail``
    v_sph = jnp.arccos(jnp.clip(-nl[..., 1], -1.0, 1.0)) / PI
    u = jnp.where(kind == PLANE, u_pl,
                  jnp.where(kind == DISK, u_dk, u_rad))
    v = jnp.where(kind == PLANE, v_pl,
                  jnp.where(kind == DISK, v_dk,
                            jnp.where(is_sph_s, v_sph, v_rad)))
    uv = jnp.stack([u, v], axis=-1)

    # back to world.  ``rot`` is the world→local map L: points return via
    # L⁻¹ (== Lᵀ only for the rigid plane/disk/cone/cylinder frames — the
    # ellipsoid frame is general affine), normals via Lᵀ (the
    # inverse-transpose of the local→world map), renormalized.
    p = jnp.einsum("nij,nj->ni", _inv3(rot), pl_out) + trans
    ng = jnp.einsum("nji,nj->ni", rot, nl)
    ng = ng / jnp.maximum(
        jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-30)
    err = gamma_bound(7) * (jnp.abs(p) + jnp.abs(trans)
                            + jnp.abs(t[..., None] * d))
    return {"p": p, "ng": ng, "ns": ng, "uv": uv, "err": err}


def frame_from_normal(n):
    """Host-side: world→local rotation rows (u, v, n) for a plane/disk
    with world normal n (Duff et al. branchless ONB, f64)."""
    n = np.asarray(n, np.float64)
    n = n / np.linalg.norm(n)
    s = 1.0 if n[2] >= 0.0 else -1.0
    a = -1.0 / (s + n[2])
    b = n[0] * n[1] * a
    u = np.array([1.0 + s * n[0] * n[0] * a, s * b, -s * n[0]])
    v = np.array([b, s + n[1] * n[1] * a, -n[1]])
    return np.stack([u, v, n])


def affine_frame(transform, center=(0, 0, 0), radius=1.0):
    """Host-side: world→local affine map L and translation for a sphere
    of ``radius`` at ``center`` under a general affine ``transform`` —
    i.e. an ellipsoid (reference ``Instance<Sphere>``,
    ``instance.rs:81-105``).  Local space is the unit sphere."""
    m = np.eye(4) if transform is None else np.asarray(transform, np.float64)
    s = np.eye(4)
    s[:3, :3] *= float(radius)
    s[:3, 3] = np.asarray(center, np.float64)
    full = m @ s
    lin = full[:3, :3]
    if abs(np.linalg.det(lin)) < 1e-30:
        raise ValueError("singular ellipsoid transform")
    return np.linalg.inv(lin), full[:3, 3].copy()


def frame_from_transform(transform):
    """Host-side: decompose a rigid (+ uniform scale) 4×4 into
    (world→local rotation rows, translation, scale).  The scale folds
    into radius/height — the reference reaches these shapes through
    ``Instance`` transforms (``instance.rs:202-299``)."""
    if transform is None:
        return np.eye(3), np.zeros(3), 1.0
    m = np.asarray(transform, np.float64)
    a = m[:3, :3]
    scale = float(np.cbrt(abs(np.linalg.det(a))))
    rot_l2w = a / scale
    err = np.abs(rot_l2w @ rot_l2w.T - np.eye(3)).max()
    if err > 1e-6:
        raise ValueError("analytic primitives support rigid + uniform-scale "
                         f"transforms only (orthogonality error {err:.2e})")
    return rot_l2w.T, m[:3, 3].copy(), scale
