"""Measure TPU cost of (N, C) vs (C, N) layouts for small C."""
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt * 1e3:9.3f} ms")
    return dt


N = 256 * 256
key = jax.random.PRNGKey(0)


def chain(x):
    # ~40 flops elementwise chain
    for _ in range(10):
        x = x * 1.0001 + 0.3
        x = jnp.maximum(x, 0.1) * x
    return jnp.sum(x)


for shape in [(N, 4), (4, N), (N, 34), (34, N), (N, 128), (N, 3), (3, N)]:
    x = jax.random.normal(key, shape)
    timed(jax.jit(chain), x, name=f"elementwise chain {shape}")

# triangle-test-like: rays (N,3) vs prims P, both layouts
P = 34
o = jax.random.normal(key, (N, 3))
a = jax.random.normal(key, (P, 3))


def tri_nc(o, a):
    # (N, P) intermediate
    rel = a[None, :, :] - o[:, None, :]            # (N, P, 3)
    e = rel[..., 0] * rel[..., 1] - rel[..., 2]    # (N, P)
    for _ in range(8):
        e = e * 1.1 + rel[..., 0]
    return jnp.min(e, axis=-1)


oT = o.T  # (3, N)
aT = a.T  # (3, P)


def tri_cn(oT, aT):
    rel = aT[:, :, None] - oT[:, None, :]          # (3, P, N)
    e = rel[0] * rel[1] - rel[2]                   # (P, N)
    for _ in range(8):
        e = e * 1.1 + rel[0]
    return jnp.min(e, axis=0)


timed(jax.jit(tri_nc), o, a, name="tri-like (N,P) layout")
timed(jax.jit(tri_cn), oT, aT, name="tri-like (P,N) layout")

# gather: mat[idx] with idx (N,) from (M, 4) vs (4, M)
M = 64
tbl = jax.random.normal(key, (M, 4))
idx = jax.random.randint(key, (N,), 0, M)
timed(jax.jit(lambda t, i: jnp.sum(t[i] * 2.0)), tbl, idx, name="gather (M,4)[idx(N)]")
tblT = tbl.T
timed(jax.jit(lambda t, i: jnp.sum(t[:, i] * 2.0)), tblT, idx,
      name="gather (4,M)[:, idx(N)]")
