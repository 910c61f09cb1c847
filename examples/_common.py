"""Shared CLI scaffolding for the example programs.

Each example is the counterpart of a reference user program
(``/root/reference/examples/*.rs``): build scene → build camera →
configure Renderer → render → save PNG. The reference examples download
meshes at runtime (``parser::mesh_from_url``); this image has no network
egress, so examples fall back to procedural stand-in meshes of the same
triangle-count class when ``./scenes/<name>.obj`` is absent.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def example_args(default_spp, default_res=512, **extra):
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=default_spp)
    p.add_argument("--res", type=int, default=default_res)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    for name, kw in extra.items():
        p.add_argument(f"--{name}", **kw)
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    return args


def load_mesh_or_blob(name, subdiv=5, seed=3, amp=0.2):
    """Load ./scenes/<name>.obj if present, else a procedural blob."""
    from lumo_tpu.scene import shapes
    from lumo_tpu.scene.instance import Mesh
    path = os.path.join("scenes", f"{name}.obj")
    if os.path.exists(path):
        from lumo_tpu.io import obj as obj_io
        verts, normals, uvs, groups = obj_io.parse_obj(obj_io._read(path))
        fv = groups[0][1]
        return Mesh(verts, fv,
                    normals=normals if groups[0][2] is not None else None,
                    normal_idx=groups[0][2])
    v, f, vn = shapes.blob(subdiv=subdiv, seed=seed, amp=amp)
    return Mesh(v, f, normals=vn)
