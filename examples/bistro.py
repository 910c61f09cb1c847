"""Bistro exterior: .obj/.mtl scene + HDR environment map + Reinhard
tone map, BDPT (counterpart of reference ``examples/bistro.rs``).
BistroV0.zip is a network asset; when ``./scenes/exterior.obj`` is absent
a procedural street stand-in with an analytic sky gradient env map runs
the same code path (env-map-as-sphere, Reinhard, BDPT)."""
from _common import example_args

args = example_args(default_spp=1024, default_res=512)

import os

import numpy as np

from lumo_tpu.camera import build_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder

if os.path.exists("scenes/exterior.obj"):
    from lumo_tpu.io.obj import scene_from_file
    sb = scene_from_file("scenes/exterior.obj",
                         mtl_source="scenes/exterior-night.mtl"
                         if os.path.exists("scenes/exterior-night.mtl") else None)
    if os.path.exists("scenes/cobblestone_street_night_4k.hdr"):
        from lumo_tpu.io.image import load_hdr
        hdr = load_hdr("scenes/cobblestone_street_night_4k.hdr") * 0.001
        env = sb.textures.image(hdr)
        sb.set_environment_map(Material.light((1.0, 1.0, 1.0), ke_tex=env))
else:
    from lumo_tpu.scene import shapes
    from lumo_tpu.scene.instance import Mesh
    sb = SceneBuilder()
    street = Material.diffuse((0.3, 0.3, 0.32))
    gv, gf = shapes.grid_plane(n=1, size=60.0, y=0.0)
    Mesh(gv, gf).add_to(sb, street)
    rng = np.random.default_rng(4)
    for i in range(8):  # facades
        t = np.eye(4)
        t[0, 0], t[1, 1], t[2, 2] = 4.0, 4.0 + 3.0 * rng.uniform(), 4.0
        t[:3, 3] = (-12.0 + 4.0 * i, t[1, 1] / 2.0, 6.0 * (-1) ** i)
        sb.add_box(Material.diffuse(tuple(0.3 + 0.4 * rng.uniform(size=3))),
                   transform=t)
    # analytic night-sky gradient as the HDR env image
    h, w = 64, 128
    v = np.linspace(0.0, 1.0, h)[:, None, None]
    sky = np.concatenate([0.02 + 0.05 * (1 - v), 0.03 + 0.06 * (1 - v),
                          0.08 + 0.12 * (1 - v)], axis=-1)
    sky = np.broadcast_to(sky, (h, w, 3)).copy()
    sky[10:14, 30:34] = (6.0, 5.5, 4.5)  # moon patch
    env = sb.textures.image(sky)
    sb.set_environment_map(Material.light((1.0, 1.0, 1.0), ke_tex=env))

camera = build_camera(origin=(-16.0, 5.0, -1.0), towards=(0.0, 0.0, 0.0),
                      resolution=(args.res, args.res))
r = (Renderer(sb.build(), camera)
     .integrator("bdpt")
     .samples(args.spp)
     .tone_map("reinhard"))
img = r.render()
out = args.out or "bistro_night.png"
r.save_png(img, out)
print(f"saved {out}")
