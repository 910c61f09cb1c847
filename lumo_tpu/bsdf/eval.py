"""BSDF evaluate / sample / pdf over material-tagged ray wavefronts.

Counterpart of reference ``src/tracer/{bsdf,bxdf}.rs`` +
``bxdf/{microfacet,scatter}.rs``: instead of enum dispatch per ray, every
lane gathers its material row and all BxDF families are evaluated masked
(the closed set is small, and the VPU eats the redundant lanes); results
select by kind tag.  Directions are transformed world↔shading space with
the Duff ONB exactly like the reference BSDF adapter (``bsdf.rs:40-90``),
including the geometric-normal reflection test.

Differentiability: sampled directions and discrete choices are detached
(stop_gradient); f and pdf stay differentiable w.r.t. the material table.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lumo_tpu.bsdf import microfacet as mf
from lumo_tpu.color import dense, uplift, wavelength
from lumo_tpu.config import RADIANCE
from lumo_tpu.geometry import onb
from lumo_tpu.geometry.onb import dot, normalize, safe_sqrt
from lumo_tpu.sampling import maps
from lumo_tpu.scene.materials import (BLANK, LAMBERTIAN, LIGHT, MF_CONDUCTOR,
                                      MF_DIELECTRIC, MF_DIFFUSE, VOLUMETRIC)

PI = jnp.pi
_TINY = 1e-30
# Geometric-denominator floors: 1e-30 guards let f32 products underflow
# to 0 (inf forward in kind-masked lanes) and make division-VJP
# intermediates overflow — 0-cotangent times inf is NaN, which poisons
# camera/geometry gradients once XLA fuses the selects.  Lanes clamped
# here have pdf >= 1e7; their contributions are ~0 either way.
_EPS_COS = 1e-7
_EPS_COS2 = 1e-10
DELTA_EPS = 1e-5      # 1 - cosθ(wh) tolerance for delta pdf checks


def _static_beck(beck_tbl, mat):
    """Per-ray Beckmann flags — or the STATIC python bool ``False`` when
    the material table provably contains no Beckmann rows, so the
    distribution dispatch in :mod:`microfacet` never builds the Beckmann
    branch (it otherwise evaluates BOTH NDF families for every lane —
    a measured ~10% flagship cost for pure-GGX scenes)."""
    if not isinstance(beck_tbl, jax.core.Tracer):
        import numpy as np
        if not np.any(np.asarray(beck_tbl)):
            return False
    return beck_tbl[mat]


def _kinds_present(kind_tbl):
    """The STATIC set of material kinds in the table, or None when the
    table is traced (then every family must be built).  The fused
    f/pdf/sample evaluators only construct branches for kinds that are
    actually present — the masked evaluate-everything dispatch otherwise
    pays the full microfacet + dielectric + volumetric cost (and 3x that
    in the VJP) even for an all-Lambertian scene.  Measured on the
    Cornell flagship: the f_pdf VJP alone was ~73% of the backward
    sweep before gating."""
    if isinstance(kind_tbl, jax.core.Tracer):
        return None
    import numpy as np
    return frozenset(int(k) for k in np.unique(np.asarray(kind_tbl)))


def _have(mp, *kinds):
    kp = mp.get("kinds_present")
    return kp is None or any(k in kp for k in kinds)


def dispersive_mask(materials: dict, mat):
    """Lanes whose material terminates hero wavelengths on sampling
    (non-constant-eta dielectric)."""
    return (materials["kind"][mat] == MF_DIELECTRIC) & ~materials["eta_const"][mat]


def gather_params(materials: dict, mat, lam, uv, textures=None, tex_kinds=(),
                  t=None):
    """Gather per-ray material parameters at wavelengths `lam` (N, 4).

    When a texture table is given, kd/ks/tf with texture ids >= 0 are
    replaced by the texture's albedo at `uv`
    (reference ``mfd.kd/ks/tf(lambda, uv)``).  ``t`` is the hit distance,
    needed by volumetric lanes (the medium BxDF's transmittance-pdf
    cancellation depends on the traveled distance,
    ``bxdf.rs:96-98``)."""
    from lumo_tpu import ops
    m = materials
    kp = _kinds_present(m["kind"])
    have = lambda *ks: kp is None or any(k in kp for k in ks)
    need_mf = have(MF_CONDUCTOR, MF_DIFFUSE, MF_DIELECTRIC)
    need_tf = have(MF_DIELECTRIC)
    need_vol = have(VOLUMETRIC)
    # one one-hot matmul selects every multi-column float table row
    # (XLA's small-table gather lowering is ~1000x the useful traffic;
    # scalar (M,) gathers are fine and stay as gathers); only slots a
    # present material family can read are gathered + uplifted
    slots = [m["kd"]]
    if need_mf:
        slots.append(m["ks"])
    if need_tf:
        slots.append(m["tf"])
    if need_vol:
        slots += [m["sigma_t"], m["sigma_s"]]
    rows = iter(ops.take_rows_many(slots, mat))
    kd_c = next(rows)
    ks_c = next(rows) if need_mf else None
    tf_c = next(rows) if need_tf else None
    st_c = next(rows) if need_vol else None
    ss_c = next(rows) if need_vol else None
    kind = m["kind"][mat]
    rough = m["roughness"][mat]
    rough_y = m["roughness_y"][mat]
    alpha = jnp.stack([rough, rough_y], axis=-1)
    zero4 = jnp.zeros(kind.shape + (4,), lam.dtype)
    if need_mf:
        eta4 = dense.sample_rows(m["eta"], mat, lam)
        k4 = dense.sample_rows(m["k"], mat, lam)
    else:
        eta4 = jnp.ones(kind.shape + (4,), lam.dtype)
        k4 = zero4
    # delta classification (reference ``microfacet.rs:79-83``, ``bxdf.rs:57-66``)
    mf_delta = (rough + rough_y) / 2.0 < 1e-3
    eta_lead = eta4[..., 0]
    is_delta = jnp.where(kind == MF_CONDUCTOR, mf_delta,
               jnp.where(kind == MF_DIELECTRIC, mf_delta | (eta_lead == 1.0),
                         False))
    out = {
        "kind": kind,
        "kinds_present": kp,
        "alpha": alpha,
        "mf_beck": _static_beck(m["mf_beck"], mat),
        "rough_mean": (rough + rough_y) / 2.0,
        "mf_delta": mf_delta,
        "is_delta": is_delta,
        "is_specular": m["is_specular"][mat],
        "eta4": eta4,
        "k4": k4,
        "eta_const": m["eta_const"][mat],
        "kd": uplift.sample(kd_c[..., None, :], lam),
        "ks": uplift.sample(ks_c[..., None, :], lam) if need_mf else zero4,
        "tf": uplift.sample(tf_c[..., None, :], lam) if need_tf else zero4,
        "hg_g": m["hg_g"][mat] if need_vol else jnp.zeros_like(rough),
        "sigma_t4": uplift.sample(st_c[..., None, :], lam) if need_vol
        else zero4,
        "sigma_s4": uplift.sample(ss_c[..., None, :], lam) if need_vol
        else zero4,
    }
    if t is None or not need_vol:
        out["t_scaled"] = jnp.zeros_like(rough)
    else:
        out["t_scaled"] = jnp.where(jnp.isfinite(t), t, 0.0) * m["t_scale"][mat]
    if textures is not None and uv is not None:
        from lumo_tpu import texture as texture_mod
        for slot in ("kd",) + (("ks",) if need_mf else ()) \
                + (("tf",) if need_tf else ()):
            tid = m[slot + "_tex"][mat]
            val = texture_mod.albedo(textures, tid, lam, uv, kinds=tex_kinds)
            out[slot] = jnp.where((tid >= 0)[..., None], val, out[slot])
    return out


def _reflect(wo, wh):
    """Mirror wo about wh; valid if result in wo's hemisphere
    (reference ``bxdf/microfacet.rs:7-17``)."""
    wi = 2.0 * dot(wo, wh)[..., None] * wh - wo
    valid = onb.same_hemisphere(wi, wo)
    return wi, valid


def _refract(eta, wo, no):
    """Snell refraction (reference ``bxdf/microfacet.rs:19-42``).  eta is
    the material IOR; orientation flip handled internally.  Assumes TIR was
    excluded by the Fresnel lobe choice."""
    cos = dot(no, wo)
    inside = cos < 0.0
    cos_to = jnp.abs(cos)
    eta_ratio = jnp.where(inside, 1.0 / eta, eta)
    n = jnp.where(inside[..., None], -no, no)
    sin2_to = 1.0 - cos_to * cos_to
    sin2_ti = sin2_to / eta_ratio ** 2
    cos_ti = safe_sqrt(1.0 - jnp.minimum(sin2_ti, 1.0))
    wi = -wo / eta_ratio[..., None] + (cos_to / eta_ratio - cos_ti)[..., None] * n
    valid = ~onb.same_hemisphere(wi, wo) & (sin2_ti < 1.0)
    return wi, valid


# ---------------------------------------------------------------------------
# f / pdf — fused evaluation (reference ``bxdf.rs:69-103`` + ``:135-151``)
#
# f and pdf share most of their work (local transforms, half-vectors,
# GGX NDF, Smith masking, Fresnel); the integrators always need both for a
# direction, so the fused form halves the BSDF math per shading event.

def _half(v):
    """Normalized half-vector with a degenerate-input guard: wo+wi can be
    the zero vector (wi == -wo), where normalize() has INF/NaN partials —
    substitute +z BEFORE the norm so gradients stay finite (the lanes are
    rejected downstream by the hemisphere/χ⁺ tests anyway)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    deg = n2 < 1e-12
    v2 = jnp.where(deg, jnp.zeros_like(v).at[..., 2].set(1.0), v)
    return v2 / jnp.sqrt(jnp.sum(v2 * v2, axis=-1, keepdims=True))


def f_pdf(mp, wo_w, wi_w, ng, ns, backface, lam, mode=RADIANCE):
    """(BSDF value (N, 4), pdf (N,)) for direction pair (wo_w, wi_w).

    Only the material families actually present in the table are built
    (static gating via ``mp["kinds_present"]``, see
    :func:`_kinds_present`); an all-Lambertian scene compiles to just the
    cosine lobe."""
    reflection = dot(ng, wi_w) * dot(ng, wo_w) >= 0.0
    wo = onb.to_local(ns, wo_w)
    wi = onb.to_local(ns, wi_w)
    kind = mp["kind"]
    need_lam = _have(mp, LAMBERTIAN, MF_DIFFUSE)
    need_refl = _have(mp, MF_CONDUCTOR, MF_DIFFUSE, MF_DIELECTRIC)
    need_die = _have(mp, MF_DIELECTRIC)
    need_vol = _have(mp, VOLUMETRIC)

    cos_o = onb.cos_theta(wo)
    cos_i = onb.cos_theta(wi)
    abs_ci = jnp.maximum(jnp.abs(cos_i), _EPS_COS)
    same_hemi = cos_o * cos_i > 0.0
    refl_ok = reflection & ~backface
    zero = jnp.zeros(wo.shape[:-1] + (4,), wo.dtype)
    out = zero
    p_out = jnp.zeros(wo.shape[:-1], wo.dtype)
    beck = mp["mf_beck"]
    z_axis = jnp.zeros_like(wo).at[..., 2].set(1.0)

    # ---- lambertian / shared cosine lobe ----
    if need_lam:
        f_lam = mp["kd"] / PI
        p_cos = jnp.where(same_hemi & (cos_i > 0.0), cos_i / PI, 0.0)

    # ---- shared microfacet reflection terms ----
    if need_refl:
        wh_r = _half(wo + wi)
        d_r = mf.d_dist(wh_r, mp["alpha"], beck)    # sign-invariant in wh
        g_r = mf.g_smith_dist(wo, wi, wh_r, mp["alpha"], beck)
        cos_wh_dot = dot(wo, wh_r)
        fr4 = mf.fresnel(cos_wh_dot[..., None], mp["eta4"], mp["k4"])
        denom_r = 4.0 * jnp.maximum(jnp.abs(cos_o), _EPS_COS) * abs_ci
        refl_coeff = (d_r * g_r / denom_r)[..., None] * fr4

        # pdf-side: upper-hemisphere half-vector + VNDF
        wh_ru = jnp.where(onb.cos_theta(wh_r)[..., None] < 0.0, -wh_r, wh_r)
        whdo_r = jnp.abs(cos_wh_dot)
        p_vndf_r = mf.normal_pdf(wh_ru, wo, mp["alpha"], beck)
        p_refl_rough = p_vndf_r / jnp.maximum(4.0 * whdo_r, _EPS_COS)
        p_refl_delta = jnp.where(1.0 - onb.cos_theta(wh_ru) < DELTA_EPS,
                                 1.0, 0.0)

    # ---- conductor (reference ``bxdf/microfacet.rs:516-530``) ----
    if _have(mp, MF_CONDUCTOR):
        fr_z = mf.fresnel(dot(wo, z_axis)[..., None], mp["eta4"], mp["k4"])
        f_cond = jnp.where(mp["mf_delta"][..., None],
                           mp["ks"] * fr_z / abs_ci[..., None],
                           mp["ks"] * refl_coeff)
        p_cond = jnp.where(mp["mf_delta"], p_refl_delta, p_refl_rough)
        p_cond = jnp.where(same_hemi, p_cond, 0.0)
        sel = kind == MF_CONDUCTOR
        out = jnp.where(sel[..., None] & refl_ok[..., None], f_cond, out)
        p_out = jnp.where(sel & reflection, p_cond, p_out)

    # ---- mf diffuse (reference ``bxdf/microfacet.rs:576-601``) ----
    if _have(mp, MF_DIFFUSE):
        fd = mf.disney_diffuse(mp["alpha"][..., 0], cos_o, cos_i,
                               onb.cos_theta(wh_r))
        f_diff = refl_coeff * mp["ks"] \
            + mp["kd"] * (1.0 - fr4) * (fd / PI)[..., None]
        pr_d = mf.f_schlick(0.04, 1.0, cos_o)
        p_spec = jnp.where(mp["mf_delta"], p_refl_delta, p_refl_rough)
        p_diff = pr_d * p_spec + (1.0 - pr_d) * p_cos
        p_diff = jnp.where(same_hemi, p_diff, 0.0)
        sel = kind == MF_DIFFUSE
        out = jnp.where(sel[..., None] & refl_ok[..., None], f_diff, out)
        p_out = jnp.where(sel & reflection, p_diff, p_out)

    # ---- dielectric (reference ``bxdf/microfacet.rs:658-721,753-821``) ----
    if need_die:
        eta = jnp.maximum(mp["eta4"][..., 0], _TINY)   # leading wavelength
        wo_inside = cos_o < 0.0
        eta_ratio = jnp.where(reflection, 1.0,
                              jnp.where(wo_inside, 1.0 / eta, eta))
        eta_one = mp["eta4"][..., 0] == 1.0
        die_delta = eta_one | mp["mf_delta"]
        wh_t = jnp.where(die_delta[..., None], z_axis,
                         _half(wi * eta_ratio[..., None] + wo))
        fr_t = mf.fresnel(dot(wo, wh_t)[..., None], mp["eta4"], mp["k4"])
        wh_tp = jnp.where(onb.cos_theta(wh_t)[..., None] < 0.0, -wh_t, wh_t)
        scale = jnp.where(mode == RADIANCE, eta_ratio ** 2, 1.0)
        # reflection branch
        f_die_refl = jnp.where(die_delta[..., None],
                               mp["ks"] * fr_t / abs_ci[..., None],
                               mp["ks"] * refl_coeff)
        # transmission branch
        d_t = mf.d_dist(wh_tp, mp["alpha"], beck)
        g_t = mf.g_smith_dist(wo, wi, wh_tp, mp["alpha"], beck)
        whdo = dot(wh_tp, wo)
        whdi = dot(wh_tp, wi)
        denom_t = jnp.maximum((eta_ratio * whdi + whdo) ** 2, _EPS_COS2)
        jac = jnp.abs(whdi * whdo
                      / jnp.maximum(jnp.abs(cos_i * cos_o), _EPS_COS))
        f_die_tran_rough = (mp["tf"] * (1.0 - fr_t)
                            * (d_t * g_t * jac
                               / (scale * denom_t))[..., None])
        f_die_tran_delta = mp["tf"] * (1.0 - fr_t) \
            / (scale * abs_ci)[..., None]
        f_die_tran = jnp.where(die_delta[..., None], f_die_tran_delta,
                               f_die_tran_rough)
        f_die = jnp.where(reflection[..., None], f_die_refl, f_die_tran)

        # dielectric pdf: same wh_t (pdf convention wh = wo + wi·eta_ratio
        # matches wi·eta_ratio + wo), flipped upward; delta lanes use the
        # z-axis test, rough lanes the VNDF with the reflect/refract
        # Jacobian
        degenerate = (whdo == 0.0) | (whdi == 0.0)
        backfacing_wh = (whdo * cos_o < 0.0) | (whdi * cos_i < 0.0)
        pr_die = mf.fresnel(whdo, eta, mp["k4"][..., 0])
        pt_die = 1.0 - pr_die
        wh_is_z = 1.0 - onb.cos_theta(wh_tp) < DELTA_EPS
        p_vndf_t = mf.normal_pdf(wh_tp, wo, mp["alpha"], beck)
        p_die = jnp.where(
            reflection & die_delta, jnp.where(wh_is_z, pr_die, 0.0),
            jnp.where(reflection,
                      p_vndf_t / jnp.maximum(4.0 * jnp.abs(whdo), _EPS_COS)
                      * pr_die,
            jnp.where(die_delta, jnp.where(wh_is_z, pt_die, 0.0),
                      p_vndf_t * jnp.abs(whdi)
                      / jnp.maximum((whdi + whdo / eta_ratio) ** 2,
                                    _EPS_COS2) * pt_die)))
        p_die = jnp.where(degenerate | backfacing_wh, 0.0, p_die)
        sel = kind == MF_DIELECTRIC
        out = jnp.where(sel[..., None], f_die, out)
        p_out = jnp.where(sel, p_die, p_out)

    # ---- volumetric: σs over the transmittance-sampling pdf, which the
    #      scene transmittance estimate cancels (``bxdf/volumetric.rs:3-18``)
    if need_vol:
        tr_v = jnp.exp(-mp["sigma_t4"] * mp["t_scaled"][..., None])
        mean_tr = jnp.maximum(jnp.mean(tr_v, axis=-1), _TINY)
        pdf_cancel = jnp.mean(tr_v * mp["sigma_t4"], axis=-1) / mean_tr
        # sanitize BEFORE masking: a tiny divisor squared underflows in
        # f32 and its division VJP becomes 0·NaN
        pc_ok = pdf_cancel > 0.0
        pc_safe = jnp.where(pc_ok, pdf_cancel, 1.0)
        f_vol = jnp.where(pc_ok[..., None],
                          mp["sigma_s4"] / pc_safe[..., None],
                          jnp.ones_like(zero))
        # HG phase pdf (reference ``bxdf/volumetric.rs:48-63``)
        g = mp["hg_g"]
        g2 = g * g
        ct_v = dot(normalize(wo_w, eps=_TINY), normalize(wi_w, eps=_TINY))
        den_v = 1.0 + g2 + 2.0 * g * ct_v
        p_vol = (1.0 - g2) / jnp.maximum(
            4.0 * PI * den_v * safe_sqrt(den_v), _EPS_COS)
        sel = kind == VOLUMETRIC
        out = jnp.where(sel[..., None], f_vol, out)
        p_out = jnp.where(sel, p_vol, p_out)

    # lambertian select last: it is the most common family, and the
    # reflection-only families reject transmission/backface configs
    # (reference ``bxdf.rs:78-84``)
    if _have(mp, LAMBERTIAN):
        sel = kind == LAMBERTIAN
        out = jnp.where(sel[..., None] & refl_ok[..., None], f_lam, out)
        p_out = jnp.where(sel & reflection, p_cos, p_out)

    out = jnp.where(jnp.isfinite(out), out, 0.0)
    p_out = jnp.where(jnp.isfinite(p_out), p_out, 0.0)
    return out, p_out


def f(mp, wo_w, wi_w, ng, ns, backface, lam, mode=RADIANCE):
    """BSDF value (N, 4).  wo_w, wi_w world-space; wo points away from the
    surface toward the viewer."""
    return f_pdf(mp, wo_w, wi_w, ng, ns, backface, lam, mode)[0]


# ---------------------------------------------------------------------------
# sample (reference ``bxdf.rs:105-133``)

def sample(mp, wo_w, ns, backface, lam, u_lobe, u_sq):
    """Sample a scattering direction.

    Returns (wi_world, valid, lam_out): lam_out has trailing hero samples
    terminated when a dispersive dielectric was sampled
    (reference ``dielectric::sample``, ``bxdf/microfacet.rs:723-751``).
    """
    wo = onb.to_local(ns, wo_w)
    kind = mp["kind"]
    z_axis = jnp.zeros_like(wo).at[..., 2].set(1.0)
    need_mf = _have(mp, MF_CONDUCTOR, MF_DIFFUSE, MF_DIELECTRIC)
    need_die = _have(mp, MF_DIELECTRIC)
    need_vol = _have(mp, VOLUMETRIC)

    # lambertian / diffuse cosine lobe (also the fallthrough default)
    wi_cos = maps.square_to_cos_hemisphere(u_sq)
    wi = wi_cos
    ok = kind == LAMBERTIAN

    if need_mf:
        wh = mf.sample_normal_dist(wo, mp["alpha"], u_sq, mp["mf_beck"])

    # conductor
    if _have(mp, MF_CONDUCTOR):
        wi_spec_delta = onb.reflect_z(wo)
        wi_refl, refl_ok = _reflect(wo, wh)
        wi_cond = jnp.where(mp["mf_delta"][..., None], wi_spec_delta,
                            wi_refl)
        cond_ok = jnp.where(mp["mf_delta"], True, refl_ok)
        sel = kind == MF_CONDUCTOR
        wi = jnp.where(sel[..., None], wi_cond, wi)
        ok = jnp.where(sel, cond_ok, ok)

    # mf diffuse: Fresnel-schlick lobe pick (reference ``diffuse::sample``)
    if _have(mp, MF_DIFFUSE):
        pr_d = mf.f_schlick(0.04, 1.0, onb.cos_theta(wo))
        pick_spec = u_lobe < pr_d
        wh_d = jnp.where(mp["mf_delta"][..., None], z_axis, wh)
        wi_dspec, dspec_ok = _reflect(wo, wh_d)
        wi_diff = jnp.where(pick_spec[..., None], wi_dspec, wi_cos)
        diff_ok = jnp.where(pick_spec, dspec_ok, True)
        sel = kind == MF_DIFFUSE
        wi = jnp.where(sel[..., None], wi_diff, wi)
        ok = jnp.where(sel, diff_ok, ok)

    # dielectric: possibly terminate wavelengths, then Fresnel lobe pick
    if need_die:
        dispersive = (kind == MF_DIELECTRIC) & ~mp["eta_const"]
        lam_out = wavelength.terminate(lam, dispersive)
        eta_lead = jnp.maximum(mp["eta4"][..., 0], _TINY)
        die_delta = (mp["eta4"][..., 0] == 1.0) | mp["mf_delta"]
        wh_t = jnp.where(die_delta[..., None], z_axis, wh)
        pr = mf.fresnel(dot(wo, wh_t), eta_lead, mp["k4"][..., 0])
        pick_refl = u_lobe < pr            # pt = 1 - pr
        wi_die_r, die_r_ok = _reflect(wo, wh_t)
        wi_die_t, die_t_ok = _refract(eta_lead, wo, wh_t)
        wi_die = jnp.where(pick_refl[..., None], wi_die_r, wi_die_t)
        die_ok = jnp.where(pick_refl, die_r_ok, die_t_ok)
        sel = kind == MF_DIELECTRIC
        wi = jnp.where(sel[..., None], wi_die, wi)
        ok = jnp.where(sel, die_ok, ok)
    else:
        lam_out = lam

    # volumetric: Henyey-Greenstein sampling about world-space wo
    # (reference ``bxdf/volumetric.rs:20-46``)
    if need_vol:
        g = mp["hg_g"]
        g2 = g * g
        iso = jnp.abs(g) < 1e-3
        g_safe = jnp.where(iso, 1.0, g)
        fract = (1.0 - g2) / jnp.maximum(1.0 - g + 2.0 * g * u_sq[..., 0],
                                         1e-6)
        # NOTE: deviates from reference ``volumetric.rs:24-33``, whose
        # sampled density is mirrored w.r.t. its own pdf (denominator
        # 1+g²-2g·cosθ vs 1+g²+2g·cosθ); the integrator's pdf-cancellation
        # hides the bug there.  We negate cosθ so sampling matches the
        # declared (PBRT-convention) pdf.
        ct_hg = jnp.where(iso, 1.0 - 2.0 * u_sq[..., 0],
                          -(1.0 + g2 - fract * fract) / (2.0 * g_safe))
        st_hg = safe_sqrt(1.0 - ct_hg ** 2)
        phi_hg = 2.0 * PI * u_sq[..., 1]
        wi_vol_local = jnp.stack([st_hg * jnp.cos(phi_hg),
                                  st_hg * jnp.sin(phi_hg), ct_hg], axis=-1)
        wi_vol = onb.to_world(normalize(wo_w, eps=_TINY), wi_vol_local)
        ok = jnp.where(kind == VOLUMETRIC, True, ok)

    # reflection-only BxDFs cannot sample from the backface
    # ((reference ``bxdf.rs:44-55,109-112``; volumetric is transmissive)
    is_transmissive = (kind == MF_DIELECTRIC) | (kind == VOLUMETRIC)
    ok = ok & (is_transmissive | ~backface)
    has_bsdf = (kind != LIGHT) & (kind != BLANK)
    ok = ok & has_bsdf

    wi_w = onb.to_world(ns, wi)
    if need_vol:
        wi_w = jnp.where((kind == VOLUMETRIC)[..., None], wi_vol, wi_w)
    wi_w = normalize(jax.lax.stop_gradient(wi_w), eps=_TINY)
    return wi_w, ok, lam_out


# ---------------------------------------------------------------------------
# pdf (reference ``bxdf.rs:135-151``)

def pdf(mp, wo_w, wi_w, ng, ns, lam):
    reflection = dot(ng, wi_w) * dot(ng, wo_w) >= 0.0
    wo = onb.to_local(ns, wo_w)
    wi = onb.to_local(ns, wi_w)
    kind = mp["kind"]
    same_hemi = onb.same_hemisphere(wo, wi)
    out = jnp.zeros(wo.shape[:-1], wo.dtype)

    # cosine pdf
    if _have(mp, LAMBERTIAN, MF_DIFFUSE):
        cos_i = onb.cos_theta(wi)
        p_cos = jnp.where(same_hemi & (cos_i > 0.0), cos_i / PI, 0.0)

    # reflection half-vector pdf
    if _have(mp, MF_CONDUCTOR, MF_DIFFUSE):
        wh_r = _half(wo + wi)
        wh_r = jnp.where(onb.cos_theta(wh_r)[..., None] < 0.0, -wh_r, wh_r)
        whdo_r = jnp.abs(dot(wo, wh_r))
        p_refl_rough = mf.normal_pdf(wh_r, wo, mp["alpha"], mp["mf_beck"]) \
            / jnp.maximum(4.0 * whdo_r, _EPS_COS)
        p_refl_delta = jnp.where(1.0 - onb.cos_theta(wh_r) < DELTA_EPS,
                                 1.0, 0.0)

    # conductor
    if _have(mp, MF_CONDUCTOR):
        p_cond = jnp.where(mp["mf_delta"], p_refl_delta, p_refl_rough)
        p_cond = jnp.where(same_hemi, p_cond, 0.0)
        out = jnp.where((kind == MF_CONDUCTOR) & reflection, p_cond, out)

    # mf diffuse
    if _have(mp, MF_DIFFUSE):
        pr_d = mf.f_schlick(0.04, 1.0, onb.cos_theta(wo))
        p_spec = jnp.where(mp["mf_delta"], p_refl_delta, p_refl_rough)
        p_diff = pr_d * p_spec + (1.0 - pr_d) * p_cos
        p_diff = jnp.where(same_hemi, p_diff, 0.0)
        out = jnp.where((kind == MF_DIFFUSE) & reflection, p_diff, out)

    # dielectric (reference ``dielectric::pdf``, ``bxdf/microfacet.rs:753-821``)
    if _have(mp, MF_DIELECTRIC):
        eta = mp["eta4"][..., 0]
        cos_o = onb.cos_theta(wo)
        wo_inside = cos_o < 0.0
        eta_ratio = jnp.where(
            reflection, 1.0,
            jnp.where(wo_inside, 1.0 / jnp.maximum(eta, _TINY), eta))
        eta_one = eta == 1.0
        die_delta = eta_one | mp["mf_delta"]
        z_axis = jnp.zeros_like(wo).at[..., 2].set(1.0)
        wh = jnp.where(eta_one[..., None], z_axis,
                       _half(wo + wi * eta_ratio[..., None]))
        wh = jnp.where(onb.cos_theta(wh)[..., None] < 0.0, -wh, wh)
        whdo = dot(wo, wh)
        whdi = dot(wi, wh)
        degenerate = (whdo == 0.0) | (whdi == 0.0)
        backfacing_wh = (whdo * cos_o < 0.0) \
            | (whdi * onb.cos_theta(wi) < 0.0)
        pr = mf.fresnel(whdo, jnp.maximum(eta, _TINY), mp["k4"][..., 0])
        pt = 1.0 - pr
        wh_is_z = 1.0 - onb.cos_theta(wh) < DELTA_EPS
        p_vndf = mf.normal_pdf(wh, wo, mp["alpha"], mp["mf_beck"])
        p_die = jnp.where(
            reflection & die_delta, jnp.where(wh_is_z, pr, 0.0),
            jnp.where(reflection,
                      p_vndf / jnp.maximum(4.0 * jnp.abs(whdo), _EPS_COS)
                      * pr,
            jnp.where(die_delta, jnp.where(wh_is_z, pt, 0.0),
                      p_vndf * jnp.abs(whdi)
                      / jnp.maximum((whdi + whdo / eta_ratio) ** 2,
                                    _EPS_COS2) * pt)))
        p_die = jnp.where(degenerate | backfacing_wh, 0.0, p_die)
        out = jnp.where(kind == MF_DIELECTRIC, p_die, out)

    # volumetric: HG phase pdf (reference ``bxdf/volumetric.rs:48-63``)
    if _have(mp, VOLUMETRIC):
        g = mp["hg_g"]
        g2 = g * g
        ct_v = dot(normalize(wo_w, eps=_TINY), normalize(wi_w, eps=_TINY))
        den_v = 1.0 + g2 + 2.0 * g * ct_v
        p_vol = (1.0 - g2) / jnp.maximum(
            4.0 * PI * den_v * safe_sqrt(den_v), _EPS_COS)
        out = jnp.where(kind == VOLUMETRIC, p_vol, out)

    if _have(mp, LAMBERTIAN):
        out = jnp.where((kind == LAMBERTIAN) & reflection, p_cos, out)

    return jnp.where(jnp.isfinite(out), out, 0.0)


def shading_cosine(mp, wi_w, ns):
    """|ns·wi| for surface materials, 1 for volumetric
    (reference ``material.rs:316-321``)."""
    c = jnp.abs(dot(ns, wi_w))
    return jnp.where(mp["kind"] == VOLUMETRIC, 1.0, c)
