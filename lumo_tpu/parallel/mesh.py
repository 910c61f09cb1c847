"""Device-mesh parallel rendering: rays sharded, scene replicated,
film psum-reduced over ICI.

TPU-native replacement of the reference's thread pool + mpsc channels
(``src/pool*``, SURVEY §2.9): the (pixel × sample) wavefront is the
data-parallel axis, sharded over a 1-D ``Mesh`` with ``shard_map``; the
scene/BVH buffers are replicated (≡ the reference's ``Arc<Scene>``); films
are reduced with ``psum`` collectives, which ride ICI inside a slice.

``Renderer.render`` builds its per-ray ``work`` function once
(``renderer.py:_make_work``) and this module lifts it onto a mesh —
single-device and sharded rendering execute the *same* function over the
same counter-based randomness, so the sharded image is bit-identical to
the single-device image for ALL integrators — path, direct, and BDPT
alike derive every draw from the per-sample ``ray_key``, never from the
shard index (``tests/test_parallel.py`` asserts single == sharded).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "rays"


def make_mesh(n_devices=None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def shard_step(mesh: Mesh, work, n_rays: int):
    """Lift a per-ray ``work(ray_ids, key, sample_base, shard_id)`` →
    (film_partial, rays) function onto `mesh`:  returns a jitted
    ``step(film, key, sample_base)`` that shards the ray-id space,
    psum-reduces the partial films over ICI, and accumulates.

    n_rays must divide the mesh size (the Renderer sizes its batches so
    it does)."""
    n_dev = mesh.devices.size
    assert n_rays % n_dev == 0, "wavefront must divide the mesh"

    def shard_fn(ray_ids, key, sample_base, stats):
        shard_id = jax.lax.axis_index(AXIS)
        film_p, stats_p, rays = work(ray_ids, key, sample_base, shard_id,
                                     stats)
        film_p = jax.tree.map(lambda x: jax.lax.psum(x, AXIS), film_p)
        stats_p = jax.tree.map(lambda x: jax.lax.psum(x, AXIS), stats_p)
        return film_p, stats_p, jax.lax.psum(rays, AXIS)

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(AXIS), P(), P(), P()),
                        out_specs=(P(), P(), P()),
                        check_rep=False)

    @jax.jit
    def step(film, stats, key, sample_base):
        ray_ids = jnp.arange(n_rays, dtype=jnp.int32)
        film_p, stats_p, rays = sharded(ray_ids, key, sample_base, stats)
        return (jax.tree.map(jnp.add, film, film_p),
                jax.tree.map(jnp.add, stats, stats_p), rays)

    return step
