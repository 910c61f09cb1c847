"""Direct-light integrator: follow specular chains, one NEE at the first
non-specular hit.

Wavefront counterpart of reference
``src/tracer/integrator/direct_light.rs`` — up to ``MAX_RECURSION``
specular bounces in a ``lax.while_loop``, then a single MIS'd NEE.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.color import wavelength
from lumo_tpu.config import RADIANCE
from lumo_tpu.geometry import intersect as geo
from lumo_tpu.integrators import common, path_trace
from lumo_tpu.sampling.samplers import _hash_u32, _randfloat
from lumo_tpu.scene import trace

_TINY = 1e-30
MAX_RECURSION = 50    # reference ``direct_light.rs:3``

_S_LOBE = jnp.uint32(0x632BE59B)
_S_SQ0 = jnp.uint32(0x85297A4D)
_S_SQ1 = jnp.uint32(0xD6E8FEB8)
_S_MED = jnp.uint32(0xE7037ED1)


def integrate(scene, o, d, lam, key=None, max_depth=MAX_RECURSION,
              ray_key=None):
    """Returns (radiance (N, 4), lam_out, depth)."""
    N = o.shape[0]
    dt = o.dtype
    if ray_key is None:
        ray_key = path_trace.ray_keys(key, N)
    state = {
        "o": o, "d": d, "lam": lam,
        "radiance": jnp.zeros((N, 4), dt),
        "gathered": jnp.ones((N, 4), dt),
        "alive": jnp.ones((N,), bool),
        "depth": jnp.zeros((N,), jnp.int32),
        "bounce": jnp.zeros((), jnp.int32),
        "rng": jnp.asarray(ray_key, jnp.uint32),
    }

    def cond(s):
        return jnp.any(s["alive"]) & (s["bounce"] <= max_depth)

    def body(s):
        rng = _hash_u32(s["rng"] + jnp.uint32(0x9E3779B9))
        hit = trace.intersect(scene, s["o"], s["d"], rng=rng, salt=_S_MED,
                               alive=s["alive"])
        alive = s["alive"] & hit["valid"]
        wo = -s["d"]
        lam = s["lam"]
        # per-segment medium transmittance (reference ``direct_light.rs:17``)
        tr_seg = trace.transmittance(scene, lam, hit["t"])
        gathered0 = s["gathered"] * jnp.where(alive[..., None], tr_seg, 1.0)

        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        u_lobe = _randfloat(rng, _S_LOBE)
        u_sq = jnp.stack([_randfloat(rng, _S_SQ0), _randfloat(rng, _S_SQ1)],
                         axis=-1)
        wi, sample_ok, lam2 = bsdf.sample(mp, wo, hit["ns"], hit["backface"],
                                          lam, u_lobe, u_sq)
        mp2 = bsdf.gather_params(scene.materials, hit["mat"], lam2, hit["uv"],
                                 scene.textures, scene.tex_kinds, t=hit["t"])

        # lights terminate with unconditional emission
        # (reference ``direct_light.rs:22-25``)
        emit = trace.emitted(scene, hit["mat"], lam, hit["uv"], hit["backface"])
        add_emit = alive & ~sample_ok
        radiance = s["radiance"] + jnp.where(add_emit[..., None],
                                             gathered0 * emit, 0.0)
        alive = alive & sample_ok

        # non-specular: single NEE then stop (reference ``direct_light.rs:27-36``)
        nee = common.shadow_rays(scene, mp2, wo, gathered0, hit, lam2, rng)
        stop_nee = alive & ~mp["is_specular"]
        radiance = radiance + jnp.where(stop_nee[..., None], nee, 0.0)
        alive = alive & mp["is_specular"]

        # specular continuation
        ro = geo.offset_ray_origin(hit["p"], hit["err"], hit["ng"], wi)
        p_sct = bsdf.pdf(mp2, wo, wi, hit["ng"], hit["ns"], lam2)
        alive = alive & (p_sct > 0.0) & jnp.isfinite(p_sct)
        # sanitize the divisor BEFORE masking: dead lanes otherwise compute
        # f/0 whose (discarded) gradients are NaN through the jnp.where
        p_safe = jnp.where(alive, p_sct, 1.0)
        f_val = bsdf.f(mp2, wo, wi, hit["ng"], hit["ns"], hit["backface"],
                       lam2, RADIANCE)
        # medium pdf cancellation (reference ``direct_light.rs:54-60``)
        f_val = jnp.where(hit["is_medium"][..., None],
                          f_val * p_safe[..., None], f_val)
        f_val = jnp.where(alive[..., None], f_val, 0.0)
        cosine = bsdf.shading_cosine(mp2, wi, hit["ns"])
        gathered = gathered0 * f_val * (cosine / p_safe)[..., None]

        return {
            "o": jnp.where(alive[..., None], ro, s["o"]),
            "d": jnp.where(alive[..., None], wi, s["d"]),
            "lam": jnp.where(alive[..., None], lam2, lam),
            "radiance": radiance,
            "gathered": jnp.where(alive[..., None], gathered, s["gathered"]),
            "alive": alive,
            "depth": s["depth"] + jnp.where(alive, 1, 0),
            "bounce": s["bounce"] + 1,
            "rng": rng,
        }

    out = jax.lax.while_loop(cond, body, state)
    return out["radiance"], out["lam"], out["depth"] + 1
