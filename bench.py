"""Driver benchmark: rays/sec/chip at 64 spp (fwd + bwd) on the Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Fault isolation (VERDICT r2 weak #1): the headline Cornell metric is
measured first, in-process; every secondary bench (BVH scene, smoke gate)
runs in its OWN SUBPROCESS under a timeout, so a hard device fault or a
hang in a sub-bench can neither crash this process nor hide the headline
number.  Run ``python bench.py --sub <name>`` to invoke one sub-bench
directly (that is what the subprocesses do).

The reference (ekarpp/lumo) publishes no numbers (BASELINE.md); the
``vs_baseline`` anchor is measured on this machine: ``tools/cpu_anchor``
is a minimal multithreaded C++ path tracer of the same workload class
(Cornell box, spectral 4-wavelength hero sampling, NEE + MIS, Russian
roulette) compiled -O3 and timed on the host CPU — see BASELINE.md for
the method and the recorded figure.  vs_baseline = rays/s/chip divided by
that anchor.

Ray accounting mirrors the reference: one ray per traced path segment plus
one shadow ray per non-delta bounce (``FilmSample.cost``, ``film.rs:26-27``).
We count 2x actual bounced segments (extension + NEE), summed from the
integrator's reported per-lane depth.
"""
import json
import os
import subprocess
import sys
import time

# Measured anchor (see BASELINE.md "Measured anchor" section): rays/s of
# tools/cpu_anchor.cpp on this image's host CPU, scaled to the reference
# default 4 render threads.  Falls back to the literature-class 2.0e6
# figure if the anchor has not been measured on this host.
CPU_ANCHOR_RAYS_PER_S = 2.0e6
CPU_ANCHOR_BVH_RAYS_PER_S = None
_ANCHOR_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_ANCHOR.json")
if os.path.exists(_ANCHOR_FILE):
    with open(_ANCHOR_FILE) as f:
        _anchor = json.load(f)
    CPU_ANCHOR_RAYS_PER_S = _anchor["rays_per_s"]
    CPU_ANCHOR_BVH_RAYS_PER_S = _anchor.get("bvh", {}).get("rays_per_s")

RES = 256
SPP = 64
DEPTH = 6

SUB_TIMEOUT_S = 1500  # per-sub-bench wall clock cap (compile included)


def bench_cornell():
    """Flagship: Cornell 256^2 @ 64spp fwd+bwd, one device program."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lumo_tpu import film as film_mod
    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace
    from lumo_tpu.scene.cornell import cornell_box

    scene = cornell_box().build()
    camera = cornell_camera(resolution=(RES, RES))
    n = RES * RES
    wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "CORNELL"), jnp.float32)
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}

    def loss_and_rays(mats, key):
        materials = {k: (mats[k] if is_float[k] else scene.materials[k])
                     for k in scene.materials}
        scene2 = dataclasses.replace(scene, materials=materials)
        pix = jnp.arange(n, dtype=jnp.uint32)
        px = (pix % RES).astype(jnp.float32)
        py = (pix // RES).astype(jnp.float32)
        u = jax.random.uniform(key, (n, 2))
        raster = jnp.stack([px, py], -1) + u
        o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
        lam = wavelength.sample(
            jax.random.uniform(jax.random.fold_in(key, 1), (n,)))
        radiance, lam_out, depth = path_trace.integrate(
            scene2, o, d, lam, key, fixed_depth=DEPTH)
        rgb = film_mod.spectral_to_rgb(radiance, lam_out, wbm)
        loss = jnp.mean(rgb ** 2)
        rays = jnp.sum(depth.astype(jnp.float32)) * 2.0
        return loss, rays

    # The whole 64-spp fwd+bwd run is ONE device program: lax.scan over
    # sample batches with gradient accumulation inside.  Host-driven
    # per-spp launches pay a dispatch round-trip each (measured 12x
    # slower through the TPU tunnel).
    @jax.jit
    def render_64spp(mats, key):
        def one(carry, i):
            (loss, rays), grads = jax.value_and_grad(
                loss_and_rays, has_aux=True)(mats, jax.random.fold_in(key, i))
            acc_loss, acc_rays, acc_g = carry
            acc_g = jax.tree.map(jnp.add, acc_g, grads)
            return (acc_loss + loss, acc_rays + rays, acc_g), None
        zero_g = jax.tree.map(jnp.zeros_like, mats)
        (loss, rays, grads), _ = jax.lax.scan(
            one, (0.0, 0.0, zero_g), jnp.arange(SPP))
        # loss and gnorm are both per-spp means so runs at different SPP
        # stay comparable
        gnorm = sum(jnp.sum(jnp.abs(g)) for g in grads.values()) / SPP
        return loss / SPP, rays, gnorm

    # forward-only variant: like-for-like vs the CPU anchor, which (like
    # the reference) has no backward pass at all
    @jax.jit
    def render_64spp_fwd(mats, key):
        def one(carry, i):
            loss, rays = loss_and_rays(mats, jax.random.fold_in(key, i))
            return (carry[0] + loss, carry[1] + rays), None
        (loss, rays), _ = jax.lax.scan(one, (0.0, 0.0), jnp.arange(SPP))
        return loss / SPP, rays

    key = jax.random.PRNGKey(42)
    # warmup / compile
    loss, rays, gnorm = render_64spp(mat_float, key)
    loss.block_until_ready()

    # best of 2 timed runs: the first post-compile run is consistently
    # ~30% slower than steady state (device ramp through the tunnel)
    fwd_bwd = 0.0
    for i in (7, 8):
        t0 = time.perf_counter()
        loss, rays, gnorm = render_64spp(mat_float,
                                         jax.random.fold_in(key, i))
        loss.block_until_ready()
        fwd_bwd = max(fwd_bwd, float(rays) / (time.perf_counter() - t0))

    loss_f, rays_f = render_64spp_fwd(mat_float, key)
    loss_f.block_until_ready()
    fwd_only = 0.0
    for i in (7, 8):
        t0 = time.perf_counter()
        loss_f, rays_f = render_64spp_fwd(mat_float,
                                          jax.random.fold_in(key, i))
        loss_f.block_until_ready()
        fwd_only = max(fwd_only, float(rays_f) / (time.perf_counter() - t0))

    # forward via the persistent wavefront (stream): terminated lanes
    # regenerate immediately instead of idling through the RR tail.
    # The faster of (batch scan, stream) becomes fwd_only; the mode is
    # recorded (VERDICT r4 task 7).
    from lumo_tpu.sampling.samplers import _hash_u32, _randfloat
    n_samples = n * SPP

    def gen(idx):
        p = (idx % n).astype(jnp.uint32)
        s = (idx // n).astype(jnp.uint32)
        gx = (p % RES).astype(jnp.float32)
        gy = (p // RES).astype(jnp.float32)
        jx = _randfloat(p, s ^ jnp.uint32(0x51633E2D))
        jy = _randfloat(p, s ^ jnp.uint32(0x68BC21EB))
        raster = jnp.stack([gx + jx, gy + jy], -1)
        oo, dd = camera.generate_ray(raster, jnp.full(raster.shape, 0.5))
        ll = wavelength.sample(_randfloat(p, s ^ jnp.uint32(0x02E5BE93)))
        rk = _hash_u32(p ^ _hash_u32(s ^ jnp.uint32(0x9E3779B9)))
        return {"o": oo, "d": dd, "lam": ll, "rng": rk}

    def fold(acc, term, st):
        return acc + jnp.sum(jnp.where(term, st["depth"], 0)) * 2.0

    @jax.jit
    def fwd_stream():
        return path_trace.integrate_stream(
            scene, gen, fold, jnp.zeros((), jnp.float32), n, n_samples)

    rays_s = fwd_stream()
    rays_s.block_until_ready()
    stream_rate = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        rays_s = fwd_stream()
        rays_s.block_until_ready()
        stream_rate = max(stream_rate,
                          float(rays_s) / (time.perf_counter() - t0))
    mode = "stream" if stream_rate > fwd_only else "batch_scan"
    return fwd_bwd, max(fwd_only, stream_rate), mode


def bench_bvh_scene():
    """Bunny-class accelerated scene: ~330k-triangle displaced icosphere
    in an empty Cornell box, forward+backward path trace through the BVH
    (BASELINE config 2 class — the flagship Cornell bench never exercises
    the acceleration structures)."""
    import jax
    import jax.numpy as jnp

    from lumo_tpu.camera import build_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace
    from lumo_tpu.scene import shapes
    from lumo_tpu.scene.cornell import empty_box
    from lumo_tpu.scene.instance import Mesh
    from lumo_tpu.scene.materials import Material

    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    mesh = Mesh(v, f, normals=vn)
    mat = Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0)
    (mesh.to_unit_size().to_origin().set_y(-0.799).translate(0.0, 0.0, -1.5)
     .add_to(sb, mat))
    scene = sb.build()
    camera = build_camera(resolution=(RES, RES))
    n = RES * RES
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    o, d = camera.generate_ray(jnp.stack([px, py], -1) + 0.5,
                               jnp.full((n, 2), 0.5))
    lam = wavelength.sample(
        jax.random.uniform(jax.random.PRNGKey(3), (n,)))

    # Packet coherence rises with lane-pool density: the same kernel
    # measured 1.78 -> 2.33 Mrays/s (bounce class) going 65k -> 524k
    # rays/call because Morton-sorted clusters tighten (fewer leaf rows
    # and node visits per packet).  So the stream runs a 262k-lane pool
    # over 32 spp instead of one lane per pixel.
    BVH_SPP = 32
    LANES = 262144
    n_samples = n * BVH_SPP
    from lumo_tpu.sampling.samplers import _hash_u32, _randfloat

    # persistent wavefront with path regeneration: terminated lanes pick
    # up fresh samples immediately instead of idling through the RR tail
    def gen(idx):
        p = (idx % n).astype(jnp.uint32)
        s = (idx // n).astype(jnp.uint32)
        gx = (p % RES).astype(jnp.float32)
        gy = (p // RES).astype(jnp.float32)
        jx = _randfloat(p, s ^ jnp.uint32(0x51633E2D))
        jy = _randfloat(p, s ^ jnp.uint32(0x68BC21EB))
        raster = jnp.stack([gx + jx, gy + jy], -1)
        oo, dd = camera.generate_ray(raster, jnp.full(raster.shape, 0.5))
        ll = wavelength.sample(_randfloat(p, s ^ jnp.uint32(0x02E5BE93)))
        rk = _hash_u32(p ^ _hash_u32(s ^ jnp.uint32(0x9E3779B9)))
        return {"o": oo, "d": dd, "lam": ll, "rng": rk}

    def fold(acc, term, st):
        return acc + jnp.sum(jnp.where(term, st["depth"], 0)) * 2.0

    @jax.jit
    def fwd():
        return path_trace.integrate_stream(
            scene, gen, fold, jnp.zeros((), jnp.float32), LANES, n_samples)

    rays = fwd()
    rays.block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        rays = fwd()
        rays.block_until_ready()
        best = max(best, float(rays) / (time.perf_counter() - t0))
    out = {"bvh_scene_tris": int(scene.n_tris),
           "bvh_scene_fwd_rays_per_sec": round(best, 1)}
    if CPU_ANCHOR_BVH_RAYS_PER_S:
        out["vs_baseline"] = round(best / CPU_ANCHOR_BVH_RAYS_PER_S, 3)

    # fwd+bwd through the accelerated scene (VERDICT r4 weak #2: the
    # repo was unmeasured exactly where it is slowest) — fixed-depth
    # remat scan with material-gradient accumulation, like the flagship
    import dataclasses
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}
    GRAD_SPP = 2
    GRAD_DEPTH = 4

    def loss_and_rays(mats, sp):
        materials = {k: (mats[k] if is_float[k] else scene.materials[k])
                     for k in scene.materials}
        sc = dataclasses.replace(scene, materials=materials)
        jx = _randfloat(pix, sp ^ jnp.uint32(0x51633E2D))
        jy = _randfloat(pix, sp ^ jnp.uint32(0x68BC21EB))
        raster = jnp.stack([px + jx, py + jy], -1)
        oo, dd = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
        ll = wavelength.sample(_randfloat(pix, sp ^ jnp.uint32(0x02E5BE93)))
        rk = _hash_u32(pix ^ _hash_u32(sp))
        r, lam_out, depth = path_trace.integrate(
            sc, oo, dd, ll, ray_key=rk, fixed_depth=GRAD_DEPTH)
        return jnp.mean(r ** 2), jnp.sum(depth.astype(jnp.float32)) * 2.0

    @jax.jit
    def fwd_bwd(mats):
        def one(carry, i):
            (loss, rays), grads = jax.value_and_grad(
                loss_and_rays, has_aux=True)(mats, jnp.uint32(i))
            acc_l, acc_r, acc_g = carry
            return (acc_l + loss, acc_r + rays,
                    jax.tree.map(jnp.add, acc_g, grads)), None
        zero_g = jax.tree.map(jnp.zeros_like, mats)
        (loss, rays, grads), _ = jax.lax.scan(
            one, (0.0, 0.0, zero_g), jnp.arange(1, GRAD_SPP + 1))
        return loss, rays, sum(jnp.sum(jnp.abs(g)) for g in grads.values())

    loss, rays_g, gn = fwd_bwd(mat_float)
    loss.block_until_ready()
    best_g = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        loss, rays_g, gn = fwd_bwd(mat_float)
        loss.block_until_ready()
        best_g = max(best_g, float(rays_g) / (time.perf_counter() - t0))
    out["bvh_scene_fwd_bwd_rays_per_sec"] = round(best_g, 1)
    out["fwd_bwd_depth"] = GRAD_DEPTH
    return out


def bench_bdpt():
    """BDPT throughput on the Cornell box (VERDICT r3 task 7: 'no BDPT
    perf number exists in BENCH').  Rays counted as generated subpath
    vertices x2 (each strategy's visibility ray rides the batched
    any-hit; ``bd_path_trace.rs:37-73`` counts path + connection rays)."""
    import jax
    import jax.numpy as jnp

    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import bdpt
    from lumo_tpu.scene.cornell import cornell_box

    scene = cornell_box().build()
    camera = cornell_camera(resolution=(RES, RES))
    n = RES * RES
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    o, d = camera.generate_ray(jnp.stack([px, py], -1) + 0.5,
                               jnp.full((n, 2), 0.5))
    lam = wavelength.sample(
        jax.random.uniform(jax.random.PRNGKey(5), (n,)))
    SPP = 4

    @jax.jit
    def run():
        def one(carry, i):
            rk = (pix * jnp.uint32(2654435761)) ^ (jnp.uint32(i)
                                                   * jnp.uint32(7919)
                                                   + jnp.uint32(13))
            r, lo, sr, sc, sm, depth = bdpt.integrate(
                scene, camera, o, d, lam, ray_key=rk)
            return carry + jnp.sum(depth.astype(jnp.float32)) * 2.0, None
        rays, _ = jax.lax.scan(one, 0.0, jnp.arange(SPP))
        return rays

    rays = run()
    rays.block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        rays = run()
        rays.block_until_ready()
        best = max(best, float(rays) / (time.perf_counter() - t0))
    return {"bdpt_cornell_rays_per_sec": round(best, 1),
            "max_verts": bdpt.MAX_VERTS, "spp": SPP}


def bench_smoke():
    """On-chip smoke gate: tools/tpu_smoke.py traces BVH + kd scenes on
    the default backend (VERDICT r2 task 2)."""
    from tools import tpu_smoke
    return tpu_smoke.run()


def bench_quality():
    """f64-CPU-reference allclose + FD pixel-grad harness (VERDICT r2
    task 4; BASELINE quality metric).  Forces the CPU backend itself.
    The ``bvh`` block carries the accelerated/instanced/textured scene's
    f64 allclose + gradient probe (VERDICT r4 task 5)."""
    from tools import quality
    out = quality.run(res=64, spp=4)
    out["bvh"] = quality.run_bvh()
    return out


SUBS = {
    "bvh": bench_bvh_scene,
    "bdpt": bench_bdpt,
    "smoke": bench_smoke,
    "quality": bench_quality,
}


def _run_sub(name):
    """Run one sub-bench in a subprocess; return its JSON dict or an
    {"error": ...} record.  Survives hard device faults and hangs."""
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sub", name],
            capture_output=True, text=True, timeout=SUB_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {SUB_TIMEOUT_S}s"}
    if p.returncode != 0:
        tail = (p.stderr or p.stdout or "").strip().splitlines()[-3:]
        return {"error": f"rc={p.returncode}: " + " | ".join(tail)[-300:]}
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {"error": "no JSON in sub-bench output"}


def main():
    rays_per_s, fwd_only, fwd_mode = bench_cornell()
    result = {
        "metric": "cornell_256_64spp_fwd_bwd_rays_per_sec_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / CPU_ANCHOR_RAYS_PER_S, 3),
        "extra": {
            "anchor_rays_per_s": CPU_ANCHOR_RAYS_PER_S,
            "fwd_only": {
                "rays_per_s": round(fwd_only, 1),
                "vs_baseline": round(fwd_only / CPU_ANCHOR_RAYS_PER_S, 3),
                "mode": fwd_mode,
            },
        },
    }
    # headline is safe from here on: sub-benches run in subprocesses
    for name in SUBS:
        result["extra"][name] = _run_sub(name)
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--sub":
        print(json.dumps(SUBS[sys.argv[2]]()))
    else:
        main()
