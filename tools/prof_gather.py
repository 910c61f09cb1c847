"""Micro-benchmark TPU gather patterns + nextafter."""
import time

import jax
import jax.numpy as jnp

N = 256 * 256
M = 16      # materials
B = 95      # dense spectrum bins
key = jax.random.PRNGKey(0)

tbl = jax.random.normal(key, (M, B))
rows = jax.random.randint(key, (N, 4), 0, M)
bins = jax.random.randint(key, (N, 4), 0, B)


def timed(fn, *args, n=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt * 1e3:9.3f} ms")
    return dt


# 1. 2D advanced indexing t[r, b]
timed(jax.jit(lambda t, r, b: jnp.sum(t[r, b])), tbl, rows, bins,
      name="2D gather t[r(N,4), b(N,4)]")

# 2. flat gather
flat = tbl.reshape(-1)
timed(jax.jit(lambda t, r, b: jnp.sum(t[r * B + b])), flat, rows, bins,
      name="flat gather t[r*B+b]")

# 3. one-hot matmul over rows then take_along bins
def onehot_then_bins(t, r, b):
    oh = jax.nn.one_hot(r[:, 0], M, dtype=t.dtype)          # (N, M)
    per = oh @ t                                             # (N, B)
    return jnp.sum(jnp.take_along_axis(per, b, axis=-1))
timed(jax.jit(onehot_then_bins), tbl, rows, bins, name="onehot rows + TAA bins")

# 4. one-hot matmul for both (bins via interval one-hot matmul)
def onehot_both(t, r, b):
    oh_r = jax.nn.one_hot(r, M, dtype=t.dtype)               # (N,4,M)
    oh_b = jax.nn.one_hot(b, B, dtype=t.dtype)               # (N,4,B)
    return jnp.sum(jnp.einsum("nkm,mb,nkb->nk", oh_r, t, oh_b))
timed(jax.jit(onehot_both), tbl, rows, bins, name="onehot both einsum")

# 5. small-table gather: t8 (8, 4)[idx (N,)]
t8 = jax.random.normal(key, (8, 4))
idx8 = jax.random.randint(key, (N,), 0, 8)
timed(jax.jit(lambda t, i: jnp.sum(t[i])), t8, idx8, name="gather (8,4)[i(N,)]")

def onehot_small(t, i):
    oh = jax.nn.one_hot(i, 8, dtype=t.dtype)
    return jnp.sum(oh @ t)
timed(jax.jit(onehot_small), t8, idx8, name="onehot (N,8)@(8,4)")

# 6. gather (T,3)[i(N,)] with T=32 (triangle gather)
t32 = jax.random.normal(key, (32, 3))
idx32 = jax.random.randint(key, (N,), 0, 32)
timed(jax.jit(lambda t, i: jnp.sum(t[i])), t32, idx32, name="gather (32,3)[i(N,)]")

# 7. nextafter vs bit bump
x = jax.random.normal(key, (N, 3))
timed(jax.jit(lambda x: jnp.sum(jnp.nextafter(x, jnp.inf))), x,
      name="nextafter (N,3)")

def bump(x):
    i = x.view(jnp.int32)
    up = jnp.where(x >= 0, i + 1, i - 1)
    return jnp.sum(up.view(jnp.float32))
timed(jax.jit(bump), x, name="bit-bump ulp (N,3)")

# 8. take_along_axis (N, 35) argmin pattern
ts = jax.random.normal(key, (N, 35))
def amin(ts):
    j = jnp.argmin(ts, axis=-1)
    return jnp.sum(jnp.take_along_axis(ts, j[:, None], axis=-1))
timed(jax.jit(amin), ts, name="argmin+TAA (N,35)")

# 9. threefry split+uniform cost
def rng_cost(k):
    ks = jax.random.split(k, 6)
    u = [jax.random.uniform(ks[i], (N,)) for i in range(6)]
    return sum(jnp.sum(x) for x in u)
timed(jax.jit(rng_cost), key, name="split6 + 6x uniform(N)")
