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
from jax.ad_checkpoint import checkpoint_name

from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.color import space, wavelength
from lumo_tpu.config import RADIANCE
from lumo_tpu.geometry import intersect as geo
from lumo_tpu.integrators import common
from lumo_tpu.sampling.samplers import _hash_u32, _randfloat
from lumo_tpu.scene import trace

_TINY = 1e-30

RR_DEPTH = 5          # reference ``path_trace.rs:3``
MAX_DEPTH = 64        # hard wavefront bound (RR terminates long before)

_S_LOBE = jnp.uint32(0x632BE59B)
_S_SQ0 = jnp.uint32(0x85297A4D)
_S_SQ1 = jnp.uint32(0xD6E8FEB8)
_S_RR = jnp.uint32(0xA0761D64)
_S_MED = jnp.uint32(0xE7037ED1)


def ray_keys(key, n):
    """Default per-ray counter states when the caller has no per-ray ids:
    hash of (key, lane)."""
    base = jax.random.bits(key, (), jnp.uint32)
    return _hash_u32(jnp.arange(n, dtype=jnp.uint32) ^ base)


def bounce(scene, s, delta):
    """One wavefront bounce: the shared body of :func:`integrate` (batch
    mode) and :func:`integrate_stream` (persistent wavefront).  Keys the
    bounce does not produce (e.g. stream metadata) pass through."""
    rng = _hash_u32(s["rng"] + jnp.uint32(0x9E3779B9))
    hit = trace.intersect(scene, s["o"], s["d"], rng=rng, salt=_S_MED,
                           alive=s["alive"])
    # the hit record is the "geometry tape": under the fixed-depth remat
    # policy it is saved, so the backward sweep recomputes only the
    # material-dependent shading math — never the intersection sweeps
    hit = {k: checkpoint_name(v, "geom") for k, v in hit.items()}
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
    # widen the tape: saving the gathered per-ray material params and
    # the fused BSDF outputs means the backward sweep recomputes only
    # cheap glue, not the one-hot gathers + microfacet math (measured
    # ~25% fwd+bwd win; full no-remat is slower AND NaN-prone)
    # (mf_beck / kinds_present may be STATIC python values — see
    # bsdf._static_beck / bsdf._kinds_present)
    mp = {k: (checkpoint_name(v, "geom") if isinstance(v, jax.Array)
              else v) for k, v in mp.items()}
    mp2 = mp

    u_lobe = _randfloat(rng, _S_LOBE)
    u_sq = jnp.stack([_randfloat(rng, _S_SQ0), _randfloat(rng, _S_SQ1)],
                     axis=-1)
    wi, sample_ok, _ = bsdf.sample(mp, wo, hit["ns"], hit["backface"],
                                   lam2, u_lobe, u_sq)
    wi = checkpoint_name(wi, "geom")
    sample_ok = checkpoint_name(sample_ok, "geom")

    # emitter hit: lights/blank have no BSDF → path ends here.  After a
    # vertex that ran NEE, the emission is the BSDF-sampled MIS
    # strategy and is power-2-weighted against the NEE pdf of the same
    # point; after delta chains / camera it counts in full
    # (reference ``path_trace.rs:22-28`` + ``integrator.rs:114-133``,
    # with the BSDF shadow ray folded onto the extension ray).
    emit = trace.emitted(scene, hit["mat"], lam, hit["uv"], hit["backface"])
    w_mis = common.emitter_mis_weight(scene, s["o"], s["d"], hit,
                                      s["p_sct"], s["did_nee"])
    add_emit = alive & ~sample_ok
    radiance = s["radiance"] + jnp.where(add_emit[..., None],
                                         gathered0 * emit
                                         * w_mis[..., None], 0.0)
    alive = alive & sample_ok

    # NEE at non-delta vertices (reference ``path_trace.rs:30-40``)
    nee = common.nee_rays(scene, mp2, wo, gathered0, hit, lam2, rng)
    do_nee = alive & ~mp["is_delta"]
    radiance = radiance + jnp.where(do_nee[..., None], nee, 0.0)

    # continue the path
    ro = geo.offset_ray_origin(hit["p"], hit["err"], hit["ng"], wi)
    f_val, p_sct = bsdf.f_pdf(mp2, wo, wi, hit["ng"], hit["ns"],
                              hit["backface"], lam2, RADIANCE)
    f_val = checkpoint_name(f_val, "geom")
    p_sct = checkpoint_name(p_sct, "geom")
    # pdf floor 1e-12: p below it would make the division VJP
    # (-ct·cos/p²) overflow f32 even though f/p itself is bounded —
    # 0-cotangent · INF NaN-poisons the material-table gradients.
    # Such paths carry astronomically-weighted firefly contributions;
    # the reference's f64 never reaches them either.
    alive = alive & (p_sct > 1e-12) & jnp.isfinite(p_sct)
    # sanitize the divisor BEFORE masking: dead lanes otherwise compute
    # f/0 whose (discarded) gradients are NaN through the jnp.where
    p_safe = jnp.where(alive, p_sct, 1.0)
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
    u_rr = _randfloat(rng, _S_RR)
    do_rr = s["depth"] >= RR_DEPTH
    killed = do_rr & (u_rr > rr_prob)
    alive = alive & ~killed
    # sanitized divisor: unselected lanes must not compute /1e-30
    # (overflow → inf → NaN cotangents through the where)
    rr_div = jnp.where(do_rr & alive, jnp.maximum(rr_prob, _TINY), 1.0)
    gathered = gathered / jax.lax.stop_gradient(rr_div)[..., None]

    out = {}
    if "prim" in s:
        # opt-in discrete-topology trace (quality harness): the prim id
        # each live lane hit this bounce, -1 for dead/missed lanes
        out["prim"] = jnp.where(s["alive"] & hit["valid"], hit["prim"], -1)
    out |= {
        "o": jnp.where(alive[..., None], ro, s["o"]),
        "d": jnp.where(alive[..., None], wi, s["d"]),
        "lam": jnp.where(alive[..., None], lam2, lam),
        "radiance": radiance,
        "gathered": jnp.where(alive[..., None], gathered, s["gathered"]),
        "alive": alive,
        "did_nee": jnp.where(alive, do_nee, s["did_nee"]),
        "p_sct": jnp.where(alive, p_sct, s["p_sct"]),
        "depth": s["depth"] + jnp.where(alive, 1, 0),
        "bounce": s["bounce"] + 1,
        "rng": rng,
    }
    for k in s:
        if k not in out:
            out[k] = s[k]
    return out



def integrate(scene, o, d, lam, key=None, delta=1.0, max_depth=MAX_DEPTH,
              fixed_depth=None, ray_key=None, remat_policy=None,
              trace_prims=False):
    """Trace a wavefront of N camera rays to completion.

    o, d: (N, 3); lam: (N, 4) hero wavelengths; delta: RR threshold.
    ``fixed_depth``: run exactly that many bounces under ``lax.scan``
    instead of ``lax.while_loop`` — required for reverse-mode autodiff
    (differentiable rendering); the while_loop path is faster for
    forward-only rendering because it exits when every lane is dead.
    ``ray_key``: (N,) uint32 per-ray counter states — all bounce-loop
    randomness is a pure hash of these, so results are independent of
    lane placement (sharded == single-device, bit-exact).  Derived from
    ``key`` when not given.
    Returns (radiance (N, 4), lam_out (N, 4), depth (N,)); with
    ``trace_prims=True`` (requires ``fixed_depth``) additionally the
    per-bounce hit-prim ids (fixed_depth, N) — the discrete path
    topology, used by the f32-vs-f64 quality harness to exclude rays
    whose bounce geometry flips between precisions.
    """
    N = o.shape[0]
    dt = o.dtype
    if ray_key is None:
        ray_key = ray_keys(key, N)
    state = {
        "o": o, "d": d, "lam": lam,
        "radiance": jnp.zeros((N, 4), dt),
        "gathered": jnp.ones((N, 4), dt),
        "alive": jnp.ones((N,), bool),
        "did_nee": jnp.zeros((N,), bool),
        "p_sct": jnp.ones((N,), dt),
        "depth": jnp.zeros((N,), jnp.int32),
        "bounce": jnp.zeros((), jnp.int32),
        "rng": jnp.asarray(ray_key, jnp.uint32),
    }
    if trace_prims:
        assert fixed_depth is not None, "trace_prims needs fixed_depth"
        state["prim"] = jnp.full((N,), -1, jnp.int32)

    def cond(s):
        return jnp.any(s["alive"]) & (s["bounce"] < max_depth)

    body = lambda s: bounce(scene, s, delta)

    if fixed_depth is None:
        out = jax.lax.while_loop(cond, body, state)
    else:
        # Remat the bounce body, SAVING the geometry tape: reverse-mode AD
        # stores the per-bounce carry plus everything tagged
        # checkpoint_name("geom") (hit records, sampled/shadow directions,
        # visibility) and recomputes only the material-dependent shading
        # math during the backward sweep.  The intersection and occlusion
        # sweeps — the dominant forward cost — run exactly once, and their
        # raw per-prim candidate tests (the truly huge residuals) are
        # never stored.
        if remat_policy is None:
            remat_policy = jax.checkpoint_policies.save_only_these_names("geom")
        body_ckpt = jax.checkpoint(body, policy=remat_policy)
        out, prims = jax.lax.scan(
            lambda s, _: ((s2 := body_ckpt(s)),
                          s2["prim"] if trace_prims else None),
            state, None, length=fixed_depth)
        if trace_prims:
            return out["radiance"], out["lam"], out["depth"], prims
    return out["radiance"], out["lam"], out["depth"]


# ---------------------------------------------------------------------------
# persistent wavefront with path regeneration

def integrate_stream(scene, gen, fold, acc0, n_lanes, n_samples, delta=1.0,
                     max_bounces=MAX_DEPTH, delta_fn=None):
    """Path tracing at ~100% lane occupancy: terminated lanes immediately
    regenerate with fresh camera samples instead of idling through the
    Russian-roulette tail (the batch ``integrate`` runs ~20 full-width
    wavefront iterations for an average path depth of ~3.5 — a 4-5x
    occupancy loss the reference's per-ray CPU recursion never pays;
    regeneration is the TPU-native equivalent of its "threads just move
    on to the next sample").

    Bit-exact with batch mode: every draw in the bounce loop is a pure
    counter-hash of the sample's ``ray_key``, so a sample's radiance is
    identical whichever lane or iteration computes it.

    gen(idx (L,) uint32) -> state dict with keys o (L,3), d (L,3),
        lam (L,4), rng (L,) uint32 [the per-sample ray_key], and any
        extra per-sample metadata (e.g. "pix") — extras ride along
        untouched by the bounce and are visible to ``fold``.
    fold(acc, term_mask (L,), state) -> acc: called once per wavefront
        iteration with the lanes that just terminated; read
        state["radiance"], state["lam"], state["depth"], metadata...
    delta_fn(acc, state) -> (L,) per-lane RR threshold, evaluated every
        wavefront iteration from the running accumulator — this is how
        the renderer's per-pixel adaptive Russian roulette
        (delta = sqrt(var/cost), reference ``task.rs:42-53``) rides the
        stream: the stats it needs accumulate in ``acc`` via ``fold``.
        Overrides the scalar ``delta`` when given.
    Returns the final acc.
    """
    L = n_lanes
    n_samples = jnp.uint32(n_samples)

    def _fresh(state, idx, mask):
        f = gen(jnp.minimum(idx, n_samples - 1))
        m1 = mask
        m3 = mask[..., None]
        out = dict(state)
        out["o"] = jnp.where(m3, f["o"], state["o"])
        out["d"] = jnp.where(m3, f["d"], state["d"])
        out["lam"] = jnp.where(m3, f["lam"], state["lam"])
        out["rng"] = jnp.where(m1, jnp.asarray(f["rng"], jnp.uint32),
                               state["rng"])
        out["radiance"] = jnp.where(m3, 0.0, state["radiance"])
        out["gathered"] = jnp.where(m3, 1.0, state["gathered"])
        out["did_nee"] = jnp.where(m1, False, state["did_nee"])
        out["p_sct"] = jnp.where(m1, 1.0, state["p_sct"])
        out["depth"] = jnp.where(m1, 0, state["depth"])
        out["alive"] = state["alive"] | m1
        for k, v in f.items():
            if k in ("o", "d", "lam", "rng"):
                continue
            state_v = state.get(k)
            if state_v is None:
                out[k] = v
            else:
                m = mask[(...,) + (None,) * (v.ndim - 1)]
                out[k] = jnp.where(m, v, state_v)
        return out

    idx0 = jnp.arange(L, dtype=jnp.uint32)
    zero = {
        "o": jnp.zeros((L, 3)), "d": jnp.zeros((L, 3)),
        "lam": jnp.zeros((L, 4)),
        "radiance": jnp.zeros((L, 4)), "gathered": jnp.ones((L, 4)),
        "alive": jnp.zeros((L,), bool),
        "did_nee": jnp.zeros((L,), bool),
        "p_sct": jnp.ones((L,)),
        "depth": jnp.zeros((L,), jnp.int32),
        "bounce": jnp.zeros((), jnp.int32),
        "rng": jnp.zeros((L,), jnp.uint32),
    }
    can0 = idx0 < n_samples
    state0 = _fresh(zero, idx0, can0)
    issued0 = jnp.minimum(jnp.uint32(L), n_samples)

    def cond(c):
        state, issued, acc = c
        return jnp.any(state["alive"])

    def body(c):
        state, issued, acc = c
        d = delta if delta_fn is None else delta_fn(acc, state)
        s2 = bounce(scene, state, d)
        over = s2["depth"] >= max_bounces
        s2["alive"] = s2["alive"] & ~over
        term = state["alive"] & ~s2["alive"]
        acc = fold(acc, term, s2)
        dead = ~s2["alive"]
        rank = jnp.cumsum(dead.astype(jnp.uint32)) - 1
        new_idx = issued + rank
        can = dead & (new_idx < n_samples)
        s3 = _fresh(s2, new_idx, can)
        issued = issued + jnp.minimum(jnp.sum(dead.astype(jnp.uint32)),
                                      n_samples - issued)
        return (s3, issued, acc)

    _, _, acc = jax.lax.while_loop(cond, body, (state0, issued0, acc0))
    return acc
