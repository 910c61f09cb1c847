"""Render the Cornell box (counterpart of reference examples/cornell.rs)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax

p = argparse.ArgumentParser()
p.add_argument("--spp", type=int, default=512)
p.add_argument("--res", type=int, default=512)
p.add_argument("--cpu", action="store_true")
p.add_argument("--integrator", default="path", choices=["path", "direct", "bdpt"])
p.add_argument("--out", default="cornell.png")
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from lumo_tpu.camera import cornell_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.cornell import cornell_box

scene = cornell_box().build()
camera = cornell_camera(resolution=(args.res, args.res))
r = (Renderer(scene, camera)
     .samples(args.spp)
     .integrator(args.integrator)
     .illuminant("CORNELL"))
img = r.render()
r.save_png(img, args.out)
print(f"saved {args.out}")
