"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The container pins ``JAX_PLATFORMS=axon`` via sitecustomize, so the
override must happen through ``jax.config`` after import (env vars are
ignored).  Tests never touch the real TPU — CPU is fast and supports an
8-device virtual mesh for sharding tests.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
