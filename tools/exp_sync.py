"""Measure the per-iteration cost of a Pallas while_loop on TPU:
(a) pure scalar loop, (b) + vector op, (c) + any-reduce feeding a
scalar branch, (d) several reduces back-to-back, (e) packed sum-reduce.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_I32 = jnp.int32
ITERS = 100000


def timed(fn, n=6, name=""):
    out = fn()
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.0250) / ITERS * 1e9
    print(f"{name:52s} {best * 1e3:9.3f} ms  (~{per:7.1f} ns/iter)",
          flush=True)
    return best


def make(variant):
    def kern(x_ref, o_ref, acc):
        o_ref[...] = jnp.zeros((8, 128), _F32)
        x = x_ref[...]

        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, s = c
            if variant == "scalar":
                pass
            elif variant == "vec":
                acc[...] = acc[...] + x * 1.000001
            elif variant == "reduce1":
                r = jnp.any(x + jnp.float32(i) > 1.5)
                s = s + jnp.where(r, 1, 0)
            elif variant == "reduce4":
                for k in range(4):
                    r = jnp.any(x + jnp.float32(i + k) > 1.5)
                    s = s + jnp.where(r, 1, 0)
            elif variant == "packed2":
                v = (x + jnp.float32(i) > 1.5).astype(_I32) \
                    + ((x + jnp.float32(i) > 1.2).astype(_I32) << 12)
                m = jnp.sum(v)
                s = s + (m & 4095) + (m >> 12)
            elif variant == "branch1":
                r = jnp.any(x + jnp.float32(i) > 1.5)

                @pl.when(r)
                def _():
                    acc[...] = acc[...] + 1.0
            return i + 1, s

        i, s = jax.lax.while_loop(cond, body, (_I32(0), _I32(0)))
        o_ref[...] = o_ref[...] + jnp.float32(s) + acc[...]

    fn = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), _F32),
        scratch_shapes=[pltpu.VMEM((8, 128), _F32)])
    x = jnp.full((8, 128), 0.5, _F32)
    return jax.jit(lambda: fn(x))


def main():
    for v in ("scalar", "vec", "reduce1", "branch1", "reduce4", "packed2"):
        try:
            timed(make(v), name=v)
        except Exception as e:  # noqa: BLE001
            print(f"{v} failed: {type(e).__name__}: {e}"[:300], flush=True)


if __name__ == "__main__":
    main()
