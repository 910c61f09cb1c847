"""Host-side coherence analysis of the bench-scene bounce mix: per-ray
wanted-node counts vs packet-union counts at 128/256/512/1024 rays per
packet, under the current (morton<<3|octant) sort and variants.

Answers: how much of the 559-wide-pops/packet is divergence waste, and
would narrower packets or a different sort key recover it?"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from lumo_tpu.camera import build_camera
from lumo_tpu.scene import shapes, trace
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.instance import Mesh
from lumo_tpu.scene.materials import Material

NS = 16384          # sampled rays (subset of the 262k pool)


def want_counts(blk, o, d, t_hit, order, group):
    """Per-packet union of wanted wide-node children, computed exactly
    like the kernel (slab vs per-ray final t), for rays grouped by
    ``order`` into packets of ``group``."""
    cb_lo = np.stack([blk["cb_lo_x"], blk["cb_lo_y"], blk["cb_lo_z"]], 1)
    cb_hi = np.stack([blk["cb_hi_x"], blk["cb_hi_y"], blk["cb_hi_z"]], 1)
    code = blk["code"]
    o = o[order]
    d = d[order]
    t_hit = t_hit[order]
    inv = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
    NPK = len(o) // group
    pops_i = np.zeros(NPK, np.int64)
    pops_l = np.zeros(NPK, np.int64)
    per_ray = np.zeros(len(o), np.int64)
    M4 = len(code) // 4
    for pk in range(NPK):
        sl = slice(pk * group, (pk + 1) * group)
        op, dp, ip, tp = o[sl], d[sl], inv[sl], t_hit[sl]
        # iterative: visit wide node if any ray wants it
        stack = [0]
        while stack:
            w = stack.pop()
            pops_i[pk] += 1
            base = 4 * w
            for k in range(4):
                c = code[base + k]
                if c == 0:
                    continue
                lo, hi = cb_lo[base + k], cb_hi[base + k]
                t0 = (lo[None] - op) * ip
                t1 = (hi[None] - op) * ip
                tn = np.minimum(t0, t1).max(1)
                tf = np.maximum(t0, t1).min(1) * 1.00000024
                wants = (tn <= tf) & (tf > 0) & (tn < tp * 1.00000024)
                per_ray[sl] += wants
                if wants.any():
                    if c > 0:
                        stack.append(c - 1)
                    else:
                        pops_l[pk] += 1
    return pops_i.mean(), pops_l.mean(), per_ray.mean()


def main():
    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    Mesh(v, f, normals=vn).to_unit_size().to_origin().set_y(-0.799) \
        .translate(0.0, 0.0, -1.5).add_to(
            sb, Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0))
    scene = sb.build()
    camera = build_camera(resolution=(256, 256))
    rng = np.random.default_rng(0)
    N = 262144
    pix = rng.integers(0, 65536, N).astype(np.uint32)
    raster = jnp.asarray(np.stack([(pix % 256), (pix // 256)], -1)
                         .astype(np.float32) + 0.5)
    o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))
    t1, p1 = jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30))(o, d)
    hitp = jnp.clip(o + t1[:, None] * d, -3, 3)
    dd = rng.normal(size=(N, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    ob = np.asarray(hitp) + 1e-4 * dd
    # final hit t for the bounce rays (for tbest-style pruning)
    t2, p2 = jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30))(
        jnp.asarray(ob), jnp.asarray(dd))
    t2 = np.minimum(np.asarray(t2), 1e30)

    blk = {k: np.asarray(scene.bvh_blk[k]) for k in
           ("cb_lo_x", "cb_lo_y", "cb_lo_z", "cb_hi_x", "cb_hi_y",
            "cb_hi_z", "code", "root")}
    lo, hi = blk["root"][0:3], blk["root"][3:6]

    # subsample
    idx = rng.choice(N, NS, replace=False)
    ob, dd, t2 = ob[idx], dd[idx], t2[idx]

    def morton_key(o, d, bits):
        q = np.clip((o - lo) / np.maximum(hi - lo, 1e-30), 0.0, 1.0)
        cells = (1 << bits) - 1
        cell = np.minimum((q * (1 << bits)).astype(np.uint64), cells)

        def spread(x):
            out = np.zeros_like(x)
            for b in range(bits):
                out |= ((x >> b) & 1) << (3 * b)
            return out

        m = (spread(cell[:, 0]) | (spread(cell[:, 1]) << 1)
             | (spread(cell[:, 2]) << 2))
        octant = ((d[:, 0] >= 0).astype(np.uint64)
                  | ((d[:, 1] >= 0).astype(np.uint64) << 1)
                  | ((d[:, 2] >= 0).astype(np.uint64) << 2))
        return m, octant

    m6, oc = morton_key(ob, dd, 6)
    m9, _ = morton_key(ob, dd, 9)
    keys = {
        "morton6|oct (current)": (m6 << 3) | oc,
        "oct|morton6": (oc << 54) | m6,
        "morton9|oct": (m9 << 3) | oc,
        "oct|morton9": (oc << 54) | m9,
    }
    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        for group in (128, 1024):
            pi, plf, pr = want_counts(blk, ob, dd, t2, order, group)
            print(f"{name:24s} group={group:5d}: int/packet {pi:7.0f} "
                  f"leaf/packet {plf:6.0f}  (per-ray wants {pr:5.1f})",
                  flush=True)


if __name__ == "__main__":
    main()
