"""Unidirectional path tracer with NEE + MIS and Russian roulette.

Wavefront re-design of reference ``src/tracer/integrator/path_trace.rs``:
the per-ray ``while let Some(hit)`` recursion becomes a single
``lax.while_loop`` over a fixed-shape SoA path state with an alive mask —
every lane advances one bounce per iteration, dead lanes are masked.
Specular chains, emitter double-count suppression via ``last_specular``,
dispersion termination, and RR survival `luminance(gathered)/delta` all
match the reference semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.color import space, wavelength
from lumo_tpu.config import RADIANCE
from lumo_tpu.geometry import intersect as geo
from lumo_tpu.integrators import common
from lumo_tpu.scene import trace

_TINY = 1e-30

RR_DEPTH = 5          # reference ``path_trace.rs:3``
MAX_DEPTH = 64        # hard wavefront bound (RR terminates long before)


def integrate(scene, o, d, lam, key, delta=1.0, max_depth=MAX_DEPTH,
              fixed_depth=None):
    """Trace a wavefront of N camera rays to completion.

    o, d: (N, 3); lam: (N, 4) hero wavelengths; delta: RR threshold.
    ``fixed_depth``: run exactly that many bounces under ``lax.scan``
    instead of ``lax.while_loop`` — required for reverse-mode autodiff
    (differentiable rendering); the while_loop path is faster for
    forward-only rendering because it exits when every lane is dead.
    Returns (radiance (N, 4), lam_out (N, 4), depth (N,)).
    """
    N = o.shape[0]
    dt = o.dtype
    state = {
        "o": o, "d": d, "lam": lam,
        "radiance": jnp.zeros((N, 4), dt),
        "gathered": jnp.ones((N, 4), dt),
        "alive": jnp.ones((N,), bool),
        "last_specular": jnp.ones((N,), bool),
        "depth": jnp.zeros((N,), jnp.int32),
        "bounce": jnp.zeros((), jnp.int32),
        "key": key,
    }

    def cond(s):
        return jnp.any(s["alive"]) & (s["bounce"] < max_depth)

    def body(s):
        key, k_nee, k_lobe, k_sq, k_rr, k_med = jax.random.split(s["key"], 6)
        hit = trace.intersect(scene, s["o"], s["d"], key=k_med)
        alive = s["alive"] & hit["valid"]
        wo = -s["d"]
        lam = s["lam"]
        # per-segment medium transmittance (reference ``path_trace.rs:20``)
        tr_seg = trace.transmittance(scene, lam, hit["t"])
        gathered0 = s["gathered"] * jnp.where(alive[..., None], tr_seg, 1.0)

        # dispersion terminates hero wavelengths BEFORE the single param
        # gather, so one gather serves sampling, NEE and eval
        lam2 = wavelength.terminate(lam, bsdf.dispersive_mask(scene.materials,
                                                              hit["mat"]))
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam2, hit["uv"],
                        scene.textures, scene.tex_kinds, t=hit["t"])
        mp2 = mp

        u_lobe = jax.random.uniform(k_lobe, (N,))
        u_sq = jax.random.uniform(k_sq, (N, 2))
        wi, sample_ok, _ = bsdf.sample(mp, wo, hit["ns"], hit["backface"],
                                       lam2, u_lobe, u_sq)

        # emitter hit: lights/blank have no BSDF → path ends here; emission
        # only counted after specular chains (reference ``path_trace.rs:22-28``)
        emit = trace.emitted(scene, hit["mat"], lam, hit["uv"], hit["backface"])
        add_emit = alive & ~sample_ok & s["last_specular"]
        radiance = s["radiance"] + jnp.where(add_emit[..., None],
                                             gathered0 * emit, 0.0)
        alive = alive & sample_ok

        # NEE at non-delta vertices (reference ``path_trace.rs:30-40``)
        nee = common.shadow_rays(scene, mp2, wo, gathered0, hit, lam2, k_nee)
        do_nee = alive & ~mp["is_delta"]
        radiance = radiance + jnp.where(do_nee[..., None], nee, 0.0)

        # continue the path
        ro = geo.offset_ray_origin(hit["p"], hit["err"], hit["ng"], wi)
        p_sct = bsdf.pdf(mp2, wo, wi, hit["ng"], hit["ns"], lam2)
        alive = alive & (p_sct > 0.0) & jnp.isfinite(p_sct)
        # sanitize the divisor BEFORE masking: dead lanes otherwise compute
        # f/0 whose (discarded) gradients are NaN through the jnp.where
        p_safe = jnp.where(alive, p_sct, 1.0)
        f_val = bsdf.f(mp2, wo, wi, hit["ng"], hit["ns"], hit["backface"],
                       lam2, RADIANCE)
        # mediums are assumed sampled perfectly per the phase function, so
        # the pdf cancels (reference ``path_trace.rs:52-58``)
        f_val = jnp.where(hit["is_medium"][..., None],
                          f_val * p_safe[..., None], f_val)
        f_val = jnp.where(alive[..., None], f_val, 0.0)
        cosine = bsdf.shading_cosine(mp2, wi, hit["ns"])
        gathered = gathered0 * f_val * (cosine / p_safe)[..., None]

        # russian roulette after RR_DEPTH (reference ``path_trace.rs:65-72``)
        lum = space.luminance(gathered, lam2)
        rr_prob = jnp.minimum(lum / delta, 1.0)
        u_rr = jax.random.uniform(k_rr, (N,))
        do_rr = s["depth"] >= RR_DEPTH
        killed = do_rr & (u_rr > rr_prob)
        alive = alive & ~killed
        # sanitized divisor: unselected lanes must not compute /1e-30
        # (overflow → inf → NaN cotangents through the where)
        rr_div = jnp.where(do_rr & alive, jnp.maximum(rr_prob, _TINY), 1.0)
        gathered = gathered / jax.lax.stop_gradient(rr_div)[..., None]

        return {
            "o": jnp.where(alive[..., None], ro, s["o"]),
            "d": jnp.where(alive[..., None], wi, s["d"]),
            "lam": jnp.where(alive[..., None], lam2, lam),
            "radiance": radiance,
            "gathered": jnp.where(alive[..., None], gathered, s["gathered"]),
            "alive": alive,
            "last_specular": jnp.where(alive, mp["is_specular"], s["last_specular"]),
            "depth": s["depth"] + jnp.where(alive, 1, 0),
            "bounce": s["bounce"] + 1,
            "key": key,
        }

    if fixed_depth is None:
        out = jax.lax.while_loop(cond, body, state)
    else:
        # Remat the bounce body: reverse-mode AD over the scan then stores
        # only the (small) per-bounce carry and recomputes the bounce
        # forward during the backward sweep — the classic HBM-for-FLOPs
        # trade; the raw residuals (hit records, BSDF params, per-prim
        # intersection tests) are ~50x the carry and make the backward
        # pass bandwidth-bound otherwise.
        body_ckpt = jax.checkpoint(
            body, policy=jax.checkpoint_policies.nothing_saveable)
        out, _ = jax.lax.scan(lambda s, _: (body_ckpt(s), None), state, None,
                              length=fixed_depth)
    return out["radiance"], out["lam"], out["depth"]
