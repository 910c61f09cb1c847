"""On-chip smoke gate (VERDICT r2 task 2): trace accelerated scenes on
the DEFAULT backend — the real chip when run outside the test suite —
so TPU-path changes can't ship untested again.

Run after every TPU-path change:  ``python tools/tpu_smoke.py``
Prints one JSON line {"ok": bool, ...} and exits non-zero on failure.
The driver bench embeds the result via ``bench.py`` ("smoke" sub-bench).

Covers:
- block-BVH Pallas packet traversal at bunny-class scale (~330k tris):
  closest-hit + any-hit + a 2-bounce fwd+bwd path trace;
- kd-tree device walk at a scale its XLA formulation handles (the kd
  Pallas kernel is tracked separately; see accel/pallas_bvh.py).

Uses the persistent compilation cache (.jax_cache) so warm runs are
seconds, not Mosaic-compile minutes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def _blob_scene(subdiv, accel="bvh"):
    from lumo_tpu.scene import shapes
    from lumo_tpu.scene.cornell import empty_box
    from lumo_tpu.scene.instance import Mesh
    from lumo_tpu.scene.materials import Material

    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=subdiv, seed=11, amp=0.22)
    mesh = Mesh(v, f, normals=vn)
    mat = Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0)
    (mesh.to_unit_size().to_origin().set_y(-0.799).translate(0.0, 0.0, -1.5)
     .add_to(sb, mat))
    return sb.build(accel=accel)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([0.0, 0.0, 0.4], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] -= 1.2
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def smoke_bvh(n_rays=8192):
    import dataclasses

    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace
    from lumo_tpu.scene import trace

    scene = _blob_scene(subdiv=7)   # ~330k triangles
    o, d = _rays(n_rays)
    t0 = time.perf_counter()

    @jax.jit
    def closest(o, d):
        return trace._closest(scene, o, d, jnp.full((o.shape[0],), 1e30))

    t, prim = closest(o, d)
    t.block_until_ready()
    hits = int(jnp.sum(prim >= 0))
    t_closest = time.perf_counter() - t0
    assert hits > n_rays // 2, f"too few hits: {hits}/{n_rays}"

    t0 = time.perf_counter()

    @jax.jit
    def occl(o, d):
        return trace.occluded(scene, o, d, jnp.full((o.shape[0],), 3.0))

    occ = occl(o, d)
    occ.block_until_ready()
    t_any = time.perf_counter() - t0

    # 2-bounce fwd+bwd through the kernel-routed scene
    lam = wavelength.sample(jnp.linspace(0.05, 0.95, n_rays))
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mats = {k: v for k, v in scene.materials.items() if is_float[k]}

    def loss(m):
        materials = {k: (m[k] if is_float[k] else scene.materials[k])
                     for k in scene.materials}
        sc = dataclasses.replace(scene, materials=materials)
        r, _, dep = path_trace.integrate(sc, o, d, lam,
                                         jax.random.PRNGKey(0),
                                         fixed_depth=2)
        return jnp.mean(r), dep

    t0 = time.perf_counter()
    (val, dep), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(mats)
    val.block_until_ready()
    t_grad = time.perf_counter() - t0
    gn = sum(float(jnp.sum(jnp.abs(v))) for v in g.values())
    assert np.isfinite(float(val)) and np.isfinite(gn) and gn > 0.0
    return {"tris": int(scene.n_tris), "rays": n_rays, "hits": hits,
            "closest_s": round(t_closest, 2), "anyhit_s": round(t_any, 2),
            "fwd_bwd_s": round(t_grad, 2)}


def smoke_bvh_large(n_rays=8192, subdiv=9):
    """Bistro-class scale (~5.2M triangles — reference
    ``examples/bistro.rs:39-53`` renders a multi-million-tri scene):
    closest-hit through the packet kernel with lblk grown to 1024
    (VERDICT r4 task 2: the old 256 cap hard-failed above ~2M tris)."""
    from lumo_tpu.scene import trace

    scene = _blob_scene(subdiv=subdiv)
    assert scene.bvh_blk is not None
    o, d = _rays(n_rays, seed=2)
    t0 = time.perf_counter()

    # the scene must be a jit ARGUMENT here: closed over, its ~1 GB of
    # triangle/block arrays would be embedded as HLO constants and the
    # tunnel's compile request rejects them (HTTP 413)
    @jax.jit
    def closest(sc, o, d):
        return trace._closest(sc, o, d, jnp.full((o.shape[0],), 1e30))

    t, prim = closest(scene, o, d)
    t.block_until_ready()
    hits = int(jnp.sum(prim >= 0))
    t_closest = time.perf_counter() - t0
    assert hits > n_rays // 2, f"too few hits: {hits}/{n_rays}"
    return {"tris": int(scene.n_tris), "lblk": int(scene.bvh_blk["lblk"]),
            "rays": n_rays, "hits": hits, "closest_s": round(t_closest, 2)}


def smoke_kd(n_rays=8192, subdiv=7):
    """kd-tree Pallas packet kernel at bunny scale (~330k tris) on the
    default backend (VERDICT r4 task 6: the old XLA per-lane walk was
    capped at 50k tris on TPU; the packet kernel replaces it)."""
    from lumo_tpu.scene import trace

    scene = _blob_scene(subdiv=subdiv, accel="kdtree")
    assert scene.kd_blk is not None
    o, d = _rays(n_rays, seed=1)
    t0 = time.perf_counter()

    @jax.jit
    def closest(o, d):
        return trace._closest(scene, o, d, jnp.full((o.shape[0],), 1e30))

    t, prim = closest(o, d)
    t.block_until_ready()
    hits = int(jnp.sum(prim >= 0))
    assert hits > n_rays // 2, f"too few kd hits: {hits}/{n_rays}"
    return {"tris": int(scene.n_tris), "lblk": int(scene.kd_blk["lblk"]),
            "rays": n_rays, "hits": hits,
            "closest_s": round(time.perf_counter() - t0, 2)}


def run():
    out = {"backend": jax.default_backend(), "ok": True}
    for name, fn in (("bvh", smoke_bvh), ("bvh_large", smoke_bvh_large),
                     ("kd", smoke_kd)):
        try:
            t0 = time.perf_counter()
            out[name] = fn()
            out[name]["total_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # noqa: BLE001 — gate must report, not die
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            out["ok"] = False
    return out


if __name__ == "__main__":
    res = run()
    print(json.dumps(res))
    sys.exit(0 if res["ok"] else 1)
