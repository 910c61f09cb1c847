"""Multi-host execution: one JAX process per host, a global device mesh
spanning every host's chips, and the same shard_map/psum render step as
single-host (``parallel/mesh.py``).

The reference's only scaling mechanism is an intra-process thread pool
(``src/pool.rs:6-55``); its cross-host analog here is JAX's
multi-controller runtime: every host runs the SAME program, arrays with
replicated sharding hold the same value everywhere (scene, camera, film
accumulator — the ``Arc<Scene>`` analog), and the (pixel × sample)
wavefront is sharded over the global mesh.  Film/stat/grad reductions are
``psum`` collectives: XLA routes them over ICI within a slice and DCN
across hosts; because the renderer accumulates locally per batch and
reduces once per step (``renderer.py:_make_step``), DCN latency is paid
once per batch, not per sample.

Usage (same program on every host):

    from lumo_tpu.parallel import distributed
    distributed.initialize(coordinator="host0:1234",
                           num_processes=4, process_id=AXON_RANK)
    img = Renderer(scene, camera).samples(1024).render()

After ``initialize`` the ordinary render path is multi-host: the
renderer's mesh is built from ``jax.devices()``, which now spans all
processes.  Determinism: every random draw is a counter-hash of
(pixel, sample), so the image is independent of the process count
(``parallel/mesh.py`` docstring; ``tests/test_distributed.py`` asserts a
2-process render matches single-process bit-for-bit).
"""
from __future__ import annotations

import jax


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None, local_devices: int | None = None,
               cpu_collectives: str | None = None):
    """Wire the JAX distributed runtime (idempotent).

    coordinator: "host:port" of process 0; None lets JAX auto-detect a
        cluster environment (SLURM/GKE/Cloud-TPU metadata).
    num_processes / process_id: cluster shape; None = auto-detect.
    local_devices: for CPU-backend testing — number of virtual CPU
        devices this process contributes (must be set BEFORE the backend
        initializes).
    cpu_collectives: "gloo" or "mpi" — the CPU cross-process collective
        implementation (required for multi-process CPU; ignored on TPU,
        which uses ICI/DCN natively).
    """
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", local_devices)
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def is_multi_process() -> bool:
    return jax.process_count() > 1


def process_summary() -> str:
    return (f"process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices")
