"""Ring of hue-swept diffuse spheres on a mirror disk around a small
spherical light (counterpart of reference ``examples/circle.rs``)."""
import math

from _common import example_args

args = example_args(default_spp=512, default_res=512)

import numpy as np

from lumo_tpu.camera import build_camera
from lumo_tpu.color import uplift
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder

PI = math.pi


def hsv_to_rgb(h):
    """s = v = 1; h in radians (reference ``circle.rs:4-14``)."""
    def f(n):
        k = (n + h / (PI / 3.0)) % 6.0
        return 1.0 - np.clip(min(k, 4.0 - k), 0.0, 1.0)
    return uplift.from_srgb8(int(f(5.0) * 255), int(f(3.0) * 255),
                             int(f(1.0) * 255)).reshape(4)


sb = SceneBuilder()
ground = -0.2
r = 0.2

# mirror ground disk — analytic, as in the reference (``circle.rs:28``)
sb.add_disk((0.0, ground, 0.0), (0.0, 1.0, 0.0), 100.0, Material.mirror())

sb.add_sphere((0.0, ground + r + 0.1, 0.0), r,
              Material.light(0.01 * np.ones(4), illuminant="D65"))

circle_s = 8
offset = PI / circle_s
for i in range(circle_s):
    theta = (i / circle_s) * 2.0 * PI + offset
    sb.add_sphere((math.cos(theta), ground + r, math.sin(theta)), r,
                  Material.diffuse(hsv_to_rgb(theta - offset)))

camera = build_camera(origin=(0.0, 1.0, 1.5), towards=(0.0, -0.5, 0.0),
                      up=(0.0, 1.0, -1.0), resolution=(args.res, args.res))
ren = Renderer(sb.build(), camera).integrator("path").samples(args.spp)
img = ren.render()
out = args.out or "circle.png"
ren.save_png(img, out)
print(f"saved {out}")
