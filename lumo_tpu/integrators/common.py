"""Shared integrator machinery: next-event estimation with power-2 MIS.

Wavefront counterpart of reference ``src/tracer/integrator.rs:74-184``
(`shadow_rays` / `single_shadow_ray` / `mis_sample`): each lane samples a
light by the alias table, shoots the light-sample and BSDF-sample shadow
rays, and combines them with the power heuristic — all as masked batch
ops, ``num_shadow_rays`` unrolled statically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.config import RADIANCE, epsilon
from lumo_tpu.geometry import intersect as geo
from lumo_tpu.sampling.samplers import _hash_u32, _randfloat
from lumo_tpu.scene import trace

_TINY = 1e-30

# Per-purpose draw salts.  All integrator randomness is counter-based
# (Kensler hash of a per-ray uint32 state x a purpose salt) so any lane of
# any shard regenerates its sequence identically — sharded rendering is
# bit-exact with single-device rendering, and no threefry runs in the
# bounce loop.  Counterpart of the reference's per-task Xorshift streams
# (``rng.rs:51-63``), redesigned for SPMD determinism (SURVEY §7).
S_LIGHT = jnp.uint32(0x2545F491)
S_SQ0 = jnp.uint32(0x9E3779B9)
S_SQ1 = jnp.uint32(0x85EBCA6B)
S_LOBE = jnp.uint32(0xC2B2AE35)
S_SQ2 = jnp.uint32(0x27D4EB2F)
S_SQ3 = jnp.uint32(0x165667B1)
S_OCC = jnp.uint32(0xD3A2646C)
S_OCCB = jnp.uint32(0xFD7046C5)


def _fold(rng, i):
    """Derive an independent per-estimate stream from a per-ray state."""
    return _hash_u32(rng ^ (jnp.uint32(i) * jnp.uint32(0x6C62272E)
                            + jnp.uint32(0xB5297A4D)))


def mis_weight_and_contrib(scene, mp, wo, wi, hit, light_hit, lam,
                           p_lig, p_sct, light_sampled, f_val):
    """The `mis_sample` term (reference ``integrator.rs:139-184``):
    f · Tr · Le · |cos| · w / p  with power-2 heuristic."""
    ok = (p_lig > 0.0) & (p_sct > 0.0) & jnp.isfinite(p_lig) & jnp.isfinite(p_sct)
    p_lig = jnp.where(ok, p_lig, 1.0)
    p_sct = jnp.where(ok, p_sct, 1.0)
    f_val = jnp.where(ok[..., None], f_val, 0.0)
    # medium hits cancel pdf (not yet: surface only)
    tr = trace.transmittance(scene, lam, light_hit["t"])
    emit = trace.emitted(scene, light_hit["mat"], lam,
                         light_hit["uv"], light_hit["backface"])
    cos = bsdf.shading_cosine(mp, wi, hit["ns"])
    # power-2 heuristic FOLDED with the 1/p_sel estimator division:
    # w/p_sel = p_sel/(p_sel² + p_oth²).  Computing w and 1/p_sel as
    # separate factors makes 1/p_sel overflow to INF for legitimately
    # tiny pdfs before the tiny weight cancels it — 0-cotangent · INF
    # then NaN-poisons the whole material-table gradient (the round-4
    # threefry-jitter NaN).  The folded form is bounded and its VJP is
    # finite; clips keep the squares inside f32 range.
    # denominator floor 1e-20 (not 1e-30): its own division VJP scales
    # as den^-1.5, and 1e-20^-1.5 = 1e30 still fits f32 while 1e-30
    # would overflow to INF (→ 0·INF NaN through the masked lanes)
    p_sel = jnp.clip(jnp.where(light_sampled, p_lig, p_sct), 0.0, 1e18)
    p_oth = jnp.clip(jnp.where(light_sampled, p_sct, p_lig), 0.0, 1e18)
    w_over_p = p_sel / jnp.maximum(p_sel * p_sel + p_oth * p_oth, 1e-20)
    contrib = f_val * tr * emit * (cos * w_over_p)[..., None]
    return jnp.where(ok[..., None], contrib, 0.0)


def _shadow_branch(scene, mp, wo, wi, hit, light, lam, light_sampled, rng,
                   salt):
    """Common tail of both NEE branches: trace to the chosen light, check
    occlusion, compute both pdfs, MIS-combine."""
    o = geo.offset_ray_origin(hit["p"], hit["err"], hit["ng"], wi)
    lh = trace.light_hit(scene, light, o, wi)
    # geometry tape (see path_trace.integrate): save the shadow-ray hit +
    # visibility so the backward remat never re-runs the occlusion sweep
    lh = {k: checkpoint_name(v, "geom") for k, v in lh.items()}
    # occlusion is a discrete visibility decision: detach its t range and
    # zero it for invalid light hits — a differentiable INF here seeds
    # NaN tangents (INF * det) in the any-hit sweep when camera/geometry
    # parameters are differentiated
    t_max = jax.lax.stop_gradient(
        (jnp.where(lh["valid"] & hit["valid"], lh["t"], 0.0) - epsilon())
        * (1.0 - 8.0 * jnp.finfo(o.dtype).eps))
    occ = trace.occluded(scene, o, wi, t_max, rng=rng, salt=salt)
    occ = checkpoint_name(occ, "geom")
    visible = lh["valid"] & ~occ
    p_lig = checkpoint_name(
        trace.sample_towards_pdf(scene, light, o, wi, lh["p"], lh["ng"]),
        "geom")
    f_val, p_sct = bsdf.f_pdf(mp, wo, wi, hit["ng"], hit["ns"],
                              hit["backface"], lam, RADIANCE)
    f_val = checkpoint_name(f_val, "geom")
    p_sct = checkpoint_name(p_sct, "geom")
    contrib = mis_weight_and_contrib(scene, mp, wo, wi, hit, lh, lam,
                                     p_lig, p_sct, light_sampled, f_val)
    return jnp.where(visible[..., None] & jnp.isfinite(contrib),
                     contrib, 0.0)


def single_shadow_ray(scene, mp, wo, hit, lam, rng):
    """One NEE estimate (reference ``integrator.rs:87-137``): sample the
    light + sample the BSDF, MIS both, divide by the light-choice pdf.
    Used where the path *terminates* at the vertex (direct-light
    integrator) so no extension ray exists to carry the BSDF strategy."""
    u_light = _randfloat(rng, S_LIGHT)
    light, pdf_light = trace.sample_light(scene, u_light)

    # branch A: sample the light
    u_sq = jnp.stack([_randfloat(rng, S_SQ0), _randfloat(rng, S_SQ1)], -1)
    wi_a = trace.sample_towards(scene, light, hit["p"], u_sq)
    wi_a = jax.lax.stop_gradient(wi_a)
    contrib_a = _shadow_branch(scene, mp, wo, wi_a, hit, light, lam, True,
                               rng, S_OCC)

    # branch B: sample the BSDF
    u_lobe = _randfloat(rng, S_LOBE)
    u_sq2 = jnp.stack([_randfloat(rng, S_SQ2), _randfloat(rng, S_SQ3)], -1)
    wi_b, ok_b, _ = bsdf.sample(mp, wo, hit["ns"], hit["backface"], lam, u_lobe, u_sq2)
    contrib_b = _shadow_branch(scene, mp, wo, wi_b, hit, light, lam, False,
                               rng, S_OCCB)
    contrib_b = jnp.where(ok_b[..., None], contrib_b, 0.0)

    return (contrib_a + contrib_b) / jnp.maximum(pdf_light[..., None], _TINY)


def nee_light_branch(scene, mp, wo, hit, lam, rng):
    """One light-sampled NEE estimate — the light branch of reference
    ``integrator.rs:96-112`` only, divided by the light-choice pdf.

    The BSDF-sampled companion strategy (reference ``:114-133``) is
    covered by the *extension* ray instead: when it lands on an emitter,
    ``path_trace`` adds the MIS-weighted emission (weight from
    :func:`emitter_mis_weight`).  Same estimator in expectation, but one
    full-scene occlusion sweep per bounce instead of two — the dominant
    wavefront cost."""
    u_light = _randfloat(rng, S_LIGHT)
    light, pdf_light = trace.sample_light(scene, u_light)
    u_sq = jnp.stack([_randfloat(rng, S_SQ0), _randfloat(rng, S_SQ1)], -1)
    wi = trace.sample_towards(scene, light, hit["p"], u_sq)
    wi = checkpoint_name(jax.lax.stop_gradient(wi), "geom")
    contrib = _shadow_branch(scene, mp, wo, wi, hit, light, lam, True,
                             rng, S_OCC)
    return contrib / jnp.maximum(pdf_light[..., None], _TINY)


def emitter_mis_weight(scene, o, d, hit, p_sct, did_nee):
    """Power-2 MIS weight for emission picked up by an *extension* ray.

    o, d: the ray that produced `hit`; p_sct: the BSDF pdf (solid angle)
    under which d was sampled at the previous vertex; did_nee: whether
    that vertex ran NEE (non-delta).  Where it did, the emitter hit is the
    BSDF-sampled strategy of the reference's MIS pair
    (``integrator.rs:139-184``) and is weighted against the light-sample
    pdf of reaching the same point; where it did not (delta chains /
    camera-first hits), emission counts in full (``path_trace.rs:24-28``)."""
    light = hit["light"]
    is_light = light >= 0
    lsafe = jnp.clip(light, 0, max(scene.n_lights - 1, 0))
    p_lig = trace.sample_towards_pdf(scene, lsafe, o, d, hit["p"], hit["ng"])
    ok = is_light & (p_sct > 0.0) & jnp.isfinite(p_sct) & (p_lig > 0.0) \
        & jnp.isfinite(p_lig)
    # overflow-safe power-2 heuristic: 1 / (1 + (p_lig/p_sct)^2)
    ratio = jnp.clip(jnp.where(ok, p_lig, 0.0)
                     / jnp.where(p_sct > 0.0, p_sct, 1.0), 0.0, 1e18)
    w = 1.0 / (1.0 + ratio * ratio)
    # a light unreachable by NEE from here (pdf 0 / edge-on) has no
    # companion strategy: full weight
    return jnp.where(did_nee, jnp.where(ok, w, 1.0), 1.0)


def nee_rays(scene, mp, wo, gathered, hit, lam, rng):
    """Average ``n_shadow_rays`` light-branch NEE estimates, scaled by path
    throughput (reference ``integrator.rs:74-85`` with the BSDF branch
    moved onto the extension ray — see :func:`nee_light_branch`)."""
    n = scene.n_shadow_rays
    acc = 0.0
    for i in range(n):
        acc = acc + nee_light_branch(scene, mp, wo, hit, lam, _fold(rng, i))
    return gathered * acc / n


def shadow_rays(scene, mp, wo, gathered, hit, lam, rng):
    """Average ``n_shadow_rays`` NEE estimates, scaled by path throughput
    (reference ``integrator.rs:74-85``)."""
    n = scene.n_shadow_rays
    acc = 0.0
    for i in range(n):
        acc = acc + single_shadow_ray(scene, mp, wo, hit, lam, _fold(rng, i))
    return gathered * acc / n
