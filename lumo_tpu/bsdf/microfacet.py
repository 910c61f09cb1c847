"""GGX microfacet distribution: NDF, Smith shadow-masking, VNDF sampling,
exact dielectric + complex-conductor Fresnel, Disney diffuse.

Batched counterpart of reference ``src/tracer/microfacet.rs`` — every
function maps (N, ...) wavefronts in shading space (z-up).  Complex
arithmetic for conductor Fresnel is explicit real/imag pairs (TPU has no
native complex), matching ``src/math/complex.rs`` + ``fr_complex``.
"""
from __future__ import annotations

import jax.numpy as jnp

from lumo_tpu.geometry import onb
from lumo_tpu.geometry.onb import dot, normalize, safe_sqrt

PI = jnp.pi
_TINY = 1e-30


def d_ggx(wh, alpha):
    """Anisotropic GGX NDF (reference ``microfacet.rs:173-196``).
    wh: (N, 3) half vectors; alpha: (N, 2) roughness.

    Written in the fully-reduced form
    D = 1/(π αx αy (cos²θ + x²/αx² + y²/αy²)²) — algebraically equal to
    the textbook cos⁴θ(1+tan²θ(…))² denominator (multiply through by
    cos⁴θ) but with NO small intermediate: cos⁴θ·(1+e)² underflows f32
    and any cap on e (a previous revision capped e at 1e9) inflates D by
    orders of magnitude for horizon-grazing wh — the round-3 dielectric
    χ² failure (declared pdf spiked ~300× just below the horizon).  The
    summed denominator is bounded below by min(1, 1/αmax²) whenever
    cos²θ is small, so forward AND VJP stay finite without caps."""
    x, y, z = wh[..., 0], wh[..., 1], wh[..., 2]
    c2 = z * z
    ok = c2 > 1e-12
    c2s = jnp.where(ok, c2, 1.0)
    # alpha floor 1e-4: lanes below the 1e-3 delta threshold are
    # dispatched to the delta branch, but this rough branch still runs
    # masked — 1/alpha² must not overflow their (discarded) gradients
    ax = jnp.maximum(alpha[..., 0], 1e-4)
    ay = jnp.maximum(alpha[..., 1], 1e-4)
    u = (x / ax) ** 2 + (y / ay) ** 2
    inv_a = 1.0 / (PI * ax * ay)
    inv_v = 1.0 / (c2s + u)
    d = inv_a * inv_v * inv_v
    return jnp.where(ok, d, 0.0)


def _lambda_ggx(w, alpha):
    """Smith Λ for GGX, exact (reference ``microfacet.rs:324-340``).

    Λ = (√(1 + a²tan²θ) − 1)/2 computed in the cap-free reduced form
    (√(z² + (αx·x)² + (αy·y)²) − |z|) / (2|z|): capping a²tan²θ (a
    previous revision capped it at 1e12) under-shadows super-grazing
    directions, the mirror image of the :func:`d_ggx` cap bug."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    c2 = z * z
    ok = c2 > 1e-12
    c2s = jnp.where(ok, c2, 1.0)
    u = (alpha[..., 0] * x) ** 2 + (alpha[..., 1] * y) ** 2
    zs = safe_sqrt(c2s)
    lam = (safe_sqrt(c2s + u) - zs) / (2.0 * zs)
    return jnp.where(ok, lam, 0.0)


def _chi_pass(wo, wh, eps):
    """χ⁺ visibility test (reference ``microfacet.rs:285-291``)."""
    chi = jnp.sign(onb.cos_theta(wh)) * dot(wo, wh) * onb.cos_theta(wo)
    return chi > eps


def g_smith(wo, wi, wh, alpha, eps=1e-7):
    g = 1.0 / (1.0 + _lambda_ggx(wo, alpha) + _lambda_ggx(wi, alpha))
    return jnp.where(_chi_pass(wo, wh, eps), g, 0.0)


def g1_smith(wo, wh, alpha, eps=1e-7):
    g = 1.0 / (1.0 + _lambda_ggx(wo, alpha))
    return jnp.where(_chi_pass(wo, wh, eps), g, 0.0)


def sample_vndf(wo, alpha, u):
    """Heitz 2018 visible-NDF sampling of GGX normals
    (reference ``microfacet.rs:384-433``).  wo: (N,3); u: (N,2)."""
    dt = wo.dtype
    w_st = normalize(jnp.stack([wo[..., 0] * alpha[..., 0],
                                wo[..., 1] * alpha[..., 1],
                                wo[..., 2]], axis=-1))
    w_st = jnp.where(w_st[..., 2:3] < 0.0, -w_st, w_st)

    # hemisphere ONB; first vector perpendicular to Z
    degenerate = (1.0 - w_st[..., 2]) < 1e-7
    zaxis = jnp.zeros_like(w_st).at[..., 2].set(1.0)
    u_b = jnp.where(degenerate[..., None],
                    jnp.zeros_like(w_st).at[..., 0].set(1.0),
                    normalize(jnp.cross(w_st, zaxis), eps=_TINY))
    v_b = jnp.cross(u_b, w_st)

    r = safe_sqrt(u[..., 0])
    theta = 2.0 * PI * u[..., 1]
    x = r * jnp.cos(theta)
    h = safe_sqrt(1.0 - x * x)
    lerp = (1.0 + w_st[..., 2]) / 2.0
    y = (1.0 - lerp) * h + lerp * r * jnp.sin(theta)
    z = safe_sqrt(1.0 - x * x - y * y)

    wm = x[..., None] * u_b + y[..., None] * v_b + z[..., None] * w_st
    wh = jnp.stack([alpha[..., 0] * wm[..., 0],
                    alpha[..., 1] * wm[..., 1],
                    jnp.maximum(wm[..., 2], jnp.asarray(1e-7, dt))], axis=-1)
    return normalize(wh)


def vndf_pdf(wh, wo, alpha):
    """PDF of `sample_vndf` (reference ``microfacet.rs:361-380``)."""
    pdf = (g1_smith(wo, wh, alpha) * d_ggx(wh, alpha)
           * jnp.abs(dot(wh, wo)) / jnp.maximum(jnp.abs(onb.cos_theta(wo)), _TINY))
    return jnp.maximum(pdf, 0.0)


# ---------------------------------------------------------------------------
# Beckmann variant (reference ``microfacet.rs:48-49,198-211,341-357,434-445``)

def d_beckmann(wh, alpha):
    """Anisotropic Beckmann NDF (PBR 8.4.2):
    exp(-tan²θ(cos²φ/αx² + sin²φ/αy²)) / (π αx αy cos⁴θ).
    The reference's Beckmann D is the isotropic special case
    (``microfacet.rs:198-211``)."""
    x, y, z = wh[..., 0], wh[..., 1], wh[..., 2]
    c2 = z * z
    ok = c2 > 1e-12
    c2s = jnp.where(ok, c2, 1.0)
    u = (x / alpha[..., 0]) ** 2 + (y / alpha[..., 1]) ** 2
    big = u > 80.0 * c2s           # exp(-80) == 0 in f32 anyway
    e = jnp.where(big, 80.0, u / jnp.where(big, 1.0, c2s))
    # factored reciprocals (see d_ggx): a fused division's VJP squares
    # the tiny denominator and underflows to 0 → INF → NaN
    inv_a = 1.0 / (PI * alpha[..., 0] * alpha[..., 1])
    inv_c = 1.0 / c2s
    d = jnp.exp(-e) * inv_a * inv_c * inv_c
    return jnp.where(ok, d, 0.0)


def _lambda_beckmann(w, alpha):
    """Smith Λ for Beckmann, PBR rational approximation with
    a = 1/(α_eff·tanθ), α_eff² = αx²cos²φ + αy²sin²φ.

    DOCUMENTED DEVIATION: the reference computes a = 1/(α·tan²θ)
    (``microfacet.rs:347``, tan² instead of tan) — that is a transcription
    slip of PBR eq. 8.21 and under-shadows grazing directions; this
    implementation uses the correct tanθ."""
    # a_eff·tanθ = sqrt((αx·x)² + (αy·y)²)/|z| — smooth reduced form
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    c2 = z * z
    okz = c2 > 1e-12
    c2s = jnp.where(okz, c2, 1.0)
    u_at = (alpha[..., 0] * x) ** 2 + (alpha[..., 1] * y) ** 2
    big_at = u_at > 1e12 * c2s
    at = safe_sqrt(jnp.where(big_at, 1e12,
                             u_at / jnp.where(big_at, 1.0, c2s)))
    abs_tan = safe_sqrt(jnp.minimum((x * x + y * y) / c2s, 1e12))
    a = 1.0 / jnp.maximum(at, _TINY)
    # double-where: the masked a>=1.6 branch must not evaluate the
    # rational with a ~ 1e30 (a² overflows f32 → INF/INF = NaN, which
    # poisons roughness gradients scene-wide since the distribution
    # dispatch evaluates Beckmann for every lane)
    big = a >= 1.6
    a_s = jnp.where(big, 1.0, a)
    lam = jnp.where(big, 0.0,
                    (1.0 - 1.259 * a_s + 0.396 * a_s * a_s)
                    / jnp.maximum(3.535 * a_s + 2.181 * a_s * a_s, _TINY))
    return jnp.where(okz & (abs_tan > 0.0), lam, 0.0)


def sample_beckmann(alpha, u):
    """Sample a Beckmann-distributed normal (full-NDF importance
    sampling, anisotropic per PBR 8.4.3; reference samples the isotropic
    case, ``microfacet.rs:434-445``).  The sampled wh has
    pdf = D(wh)·cosθ_wh."""
    # quadrant-correct anisotropic phi
    phi_iso = 2.0 * PI * u[..., 1]
    phi = jnp.arctan(alpha[..., 1] / alpha[..., 0]
                     * jnp.tan(phi_iso + 0.5 * PI))
    phi = phi + jnp.where(u[..., 1] > 0.5, PI, 0.0)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    log_u = jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-30))
    tan2 = -log_u / jnp.maximum((cp / alpha[..., 0]) ** 2
                                + (sp / alpha[..., 1]) ** 2, _TINY)
    cos_t = 1.0 / safe_sqrt(1.0 + tan2)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    return jnp.stack([sin_t * cp, sin_t * sp, cos_t], axis=-1)


def beckmann_pdf(wh, alpha):
    """PDF of `sample_beckmann` (D·cosθ, ``microfacet.rs:367-370``)."""
    return jnp.maximum(d_beckmann(wh, alpha) * onb.cos_theta(wh), 0.0)


# ---------------------------------------------------------------------------
# distribution dispatch: one masked select over the closed {GGX, Beckmann}
# set (the reference's enum match, ``microfacet.rs:140``).  When the
# material table provably contains no Beckmann rows, ``gather_params``
# passes ``beck=False`` as a STATIC python bool and the Beckmann branch
# is never built — scenes pay only for the distributions they use.

def d_dist(wh, alpha, beck):
    if isinstance(beck, bool):
        return d_beckmann(wh, alpha) if beck else d_ggx(wh, alpha)
    return jnp.where(beck, d_beckmann(wh, alpha), d_ggx(wh, alpha))


def g_smith_dist(wo, wi, wh, alpha, beck, eps=1e-7):
    if isinstance(beck, bool):
        lam_f = _lambda_beckmann if beck else _lambda_ggx
        lam_o, lam_i = lam_f(wo, alpha), lam_f(wi, alpha)
    else:
        lam_o = jnp.where(beck, _lambda_beckmann(wo, alpha),
                          _lambda_ggx(wo, alpha))
        lam_i = jnp.where(beck, _lambda_beckmann(wi, alpha),
                          _lambda_ggx(wi, alpha))
    g = 1.0 / (1.0 + lam_o + lam_i)
    return jnp.where(_chi_pass(wo, wh, eps), g, 0.0)


def normal_pdf(wh, wo, alpha, beck):
    """PDF of `sample_normal_dist` over half-vectors: VNDF for GGX,
    D·cosθ for Beckmann (``microfacet.rs:361-380``)."""
    if isinstance(beck, bool):
        return beckmann_pdf(wh, alpha) if beck else vndf_pdf(wh, wo, alpha)
    return jnp.where(beck, beckmann_pdf(wh, alpha), vndf_pdf(wh, wo, alpha))


def sample_normal_dist(wo, alpha, u, beck):
    # Beckmann samples the full NDF: flip into wo's hemisphere like the
    # pdf's |cos| convention expects (reference keeps wh upward and
    # relies on the χ⁺ test)
    if isinstance(beck, bool):
        return sample_beckmann(alpha, u) if beck else sample_vndf(wo, alpha, u)
    wh_g = sample_vndf(wo, alpha, u)
    wh_b = sample_beckmann(alpha, u)
    return jnp.where(beck[..., None], wh_b, wh_g)


# ---------------------------------------------------------------------------
# Fresnel

def fr_real(cos_o_signed, eta):
    """Exact real dielectric Fresnel with TIR; cos_o_signed = wo·wh
    (sign encodes inside/outside), eta: outside IOR ratio
    (reference ``microfacet.rs:262-282``)."""
    inside = cos_o_signed < 0.0
    eta_r = jnp.where(inside, 1.0 / eta, eta)
    cos_o = jnp.abs(cos_o_signed)
    sin2_o = 1.0 - cos_o * cos_o
    sin2_i = sin2_o / (eta_r * eta_r)
    tir = sin2_i >= 1.0
    cos_i = safe_sqrt(1.0 - jnp.minimum(sin2_i, 1.0))
    r_par = (eta_r * cos_o - cos_i) / jnp.maximum(eta_r * cos_o + cos_i, _TINY)
    r_per = (cos_o - eta_r * cos_i) / jnp.maximum(cos_o + eta_r * cos_i, _TINY)
    f = (r_par ** 2 + r_per ** 2) / 2.0
    return jnp.where(tir, 1.0, f)


def _csqrt(re, im):
    """Principal complex sqrt from real/imag parts (gradient-safe)."""
    r = safe_sqrt(re * re + im * im)
    a = safe_sqrt((r + re) / 2.0)
    b = jnp.sign(im) * safe_sqrt((r - re) / 2.0)
    # im == 0, re < 0: sqrt is purely imaginary positive
    b = jnp.where((im == 0.0) & (re < 0.0), safe_sqrt(-re), b)
    return a, b


def fr_complex(cos_o, eta, k):
    """Exact conductor Fresnel with complex IOR η + iκ
    (reference ``microfacet.rs:246-259``).  cos_o clamped to [0,1]."""
    c = jnp.clip(cos_o, 0.0, 1.0)
    sin2_o = 1.0 - c * c
    # sin2_i = sin2_o / eta^2  (complex division)
    e2_re = eta * eta - k * k
    e2_im = 2.0 * eta * k
    denom = e2_re * e2_re + e2_im * e2_im
    s_re = sin2_o * e2_re / jnp.maximum(denom, _TINY)
    s_im = -sin2_o * e2_im / jnp.maximum(denom, _TINY)
    # cos_i = sqrt(1 - sin2_i)
    ci_re, ci_im = _csqrt(1.0 - s_re, -s_im)
    # r_par = (eta cos_o - cos_i) / (eta cos_o + cos_i)
    ec_re, ec_im = eta * c, k * c
    num_re, num_im = ec_re - ci_re, ec_im - ci_im
    den_re, den_im = ec_re + ci_re, ec_im + ci_im
    dd = jnp.maximum(den_re ** 2 + den_im ** 2, _TINY)
    rp_re = (num_re * den_re + num_im * den_im) / dd
    rp_im = (num_im * den_re - num_re * den_im) / dd
    # r_per = (cos_o - eta cos_i) / (cos_o + eta cos_i)
    eci_re = eta * ci_re - k * ci_im
    eci_im = eta * ci_im + k * ci_re
    num_re, num_im = c - eci_re, -eci_im
    den_re, den_im = c + eci_re, eci_im
    dd = jnp.maximum(den_re ** 2 + den_im ** 2, _TINY)
    rs_re = (num_re * den_re + num_im * den_im) / dd
    rs_im = (num_im * den_re - num_re * den_im) / dd
    return ((rp_re ** 2 + rp_im ** 2) + (rs_re ** 2 + rs_im ** 2)) / 2.0


def fresnel(cos_o_signed, eta, k):
    """Dispatch: conductor when k > 0, dielectric otherwise, 0 when
    eta == 0 (reference ``microfacet.rs:231-243``).  All args (..., 4)
    per-wavelength.  Unselected branches get sanitized inputs so their
    (discarded) gradients stay finite."""
    is_cond = k > 0.0
    eta_d = jnp.where(is_cond | (eta == 0.0), 1.5, eta)
    f_d = fr_real(cos_o_signed, eta_d)
    eta_c = jnp.where(is_cond, eta, 1.0)
    k_c = jnp.where(is_cond, k, 1.0)
    f_c = fr_complex(cos_o_signed, eta_c, k_c)
    return jnp.where(is_cond, f_c, jnp.where(eta == 0.0, 0.0, f_d))


def f_schlick(f0, f90, cos_theta):
    return f0 + (f90 - f0) * (1.0 - cos_theta) ** 5


def disney_diffuse(alpha_x, cos_wo, cos_wi, cos_wh):
    """Burley 2012 diffuse with Frostbite renormalization
    (reference ``microfacet.rs:147-163``)."""
    r2 = alpha_x ** 2
    energy_bias = 0.5 * r2
    fd90 = energy_bias + 2.0 * cos_wh ** 2 * r2
    view = f_schlick(1.0, fd90, cos_wo)
    light = f_schlick(1.0, fd90, cos_wi)
    energy_factor = 1.0 + r2 * (1.0 / 1.51 - 1.0)
    return view * light * energy_factor
