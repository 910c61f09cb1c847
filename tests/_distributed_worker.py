"""Worker for tests/test_distributed.py: one JAX process of a 2-process
CPU cluster.  Renders the Cornell box over the GLOBAL 4-device mesh
(2 virtual CPU devices per process) and prints a checksum line."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from lumo_tpu.parallel import distributed  # noqa: E402

port = sys.argv[1]
pid = int(sys.argv[2])
distributed.initialize(coordinator=f"localhost:{port}", num_processes=2,
                       process_id=pid, local_devices=2,
                       cpu_collectives="gloo")

import numpy as np  # noqa: E402

from lumo_tpu.camera import cornell_camera  # noqa: E402
from lumo_tpu.renderer import Renderer  # noqa: E402
from lumo_tpu.scene.cornell import cornell_box  # noqa: E402

assert jax.device_count() == 4, jax.device_count()
assert jax.process_count() == 2
print(distributed.process_summary(), file=sys.stderr)

scene = cornell_box().build()
camera = cornell_camera(resolution=(16, 16))
img = Renderer(scene, camera).samples(8).seed(7).render(verbose=False)
img = np.asarray(img, np.float64)
print(f"CHECKSUM {img.sum():.9e} {np.abs(img).max():.9e}", flush=True)
