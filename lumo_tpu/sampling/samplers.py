"""Stateless pixel samplers: uniform, jittered, correlated multi-jittered,
and Sobol — all as pure index→point functions, TPU-friendly.

The reference streams per-pixel sample iterators in batches of 256
(``src/samplers.rs``); here a whole wavefront's worth of sample offsets is
computed in one vectorized call from (sample_index, batch_size, seed) with
counter-based hashing, so any lane of any shard can regenerate its sample
deterministically with no sequential state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

UNIFORM = 0
JITTERED = 1
MULTI_JITTERED = 2  # default, Kensler 2013 correlated shuffle
SOBOL = 3


def _hash_u32(x):
    """A small avalanche hash (uint32)."""
    x = jnp.asarray(x, jnp.uint32)
    x ^= x >> 17
    x *= jnp.uint32(0xED5AD4BB)
    x ^= x >> 11
    x *= jnp.uint32(0xAC4C1B51)
    x ^= x >> 15
    x *= jnp.uint32(0x31848BAB)
    x ^= x >> 14
    return x


def _permute(i, l, p):
    """Kensler's in-place cycle-walking permutation of [0, l) (public
    technique from 'Correlated Multi-Jittered Sampling', Pixar TM 13-01).

    i, p: uint32 arrays; l: static python int (power-of-two mask applied
    internally).  Returns a bijective shuffle of i within [0, l).
    """
    l = int(l)
    w = np.uint32(l - 1)
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    i = jnp.asarray(i, jnp.uint32)
    p = jnp.asarray(p, jnp.uint32)

    # NOTE: this is NOT Kensler's published mixing hash.  That hash
    # multiplies by even constants (e.g. 0x74DCCA9A), which is not
    # invertible mod 2^k — for small l entire cycles avoid [0, l) and
    # distinct inputs collide (permute(0,2,0) == permute(1,2,0) == 0).
    # Here every op is a bijection of [0, w+1): xor with a masked
    # constant, multiply by an ODD constant then mask, masked xorshift.
    # The cycle-walk below is then exact: it terminates and the result
    # is a true permutation of [0, l) for every l.
    def step(i):
        i ^= p & w
        i = (i * jnp.uint32(0x9E3779B1)) & w     # odd
        i ^= i >> 3
        i ^= (p >> 13) & w
        i = (i * jnp.uint32(0x85EBCA77)) & w     # odd
        i ^= i >> 7
        i ^= (p >> 23) & w
        i = (i * jnp.uint32(0xC2B2AE35)) & w     # odd
        i ^= i >> 5
        return i

    lim = jnp.uint32(l)
    val = step(i)
    done = val < lim

    def cond_fn(state):
        _, done = state
        return ~jnp.all(done)

    def body_fn(state):
        val, done = state
        nxt = step(val)
        val = jnp.where(done, val, nxt)
        return val, val < lim

    val, _ = jax.lax.while_loop(cond_fn, body_fn, (val, done))
    return (val + p) % lim


def _randfloat(i, p):
    """Kensler's hash → float in [0,1)."""
    i = jnp.asarray(i, jnp.uint32)
    p = jnp.asarray(p, jnp.uint32)
    i ^= p
    i ^= i >> 17
    i ^= i >> 10
    i *= jnp.uint32(0xB36534E5)
    i ^= i >> 12
    i ^= i >> 21
    i *= jnp.uint32(0x93FC4795)
    i ^= jnp.uint32(0xDF6E307F)
    i ^= i >> 17
    i *= jnp.uint32(1 | (p >> 18))
    return i.astype(jnp.float32) * (1.0 / 4294967808.0)


def cmj(s, m, n, p):
    """Correlated multi-jittered 2D sample `s` of an m×n grid with pattern
    seed `p`.  All args broadcastable uint32 arrays except static m, n."""
    N = int(m) * int(n)
    s = _permute(s, N, p * jnp.uint32(0x51633E2D))
    sx = _permute(s % m, m, p * jnp.uint32(0x68BC21EB))
    sy = _permute(s // m, n, p * jnp.uint32(0x02E5BE93))
    jx = _randfloat(s, p * jnp.uint32(0x967A889B))
    jy = _randfloat(s, p * jnp.uint32(0x368CC8B7))
    x = (sx.astype(jnp.float32) + (sy.astype(jnp.float32) + jx) / n) / m
    y = (s.astype(jnp.float32) + jy) / N
    return jnp.stack([x, y], axis=-1)


# --- Sobol (2D, gray-code, direction numbers for polynomials x^2+x+1) ----

def _sobol_directions():
    # dim 0: van der Corput (identity directions)
    v0 = np.array([1 << (31 - i) for i in range(32)], dtype=np.uint64)
    # dim 1: primitive polynomial x^2 + x + 1 (a=1), m = 1, 3, 5, 15, ...
    v1 = np.zeros(32, dtype=np.uint64)
    # standard recurrence for s=2, a=1: m_i = 2*a1*m_{i-1} XOR 4*m_{i-2} XOR m_{i-2}
    m = [1, 3]
    for i in range(2, 32):
        m.append((2 * m[i - 1]) ^ (4 * m[i - 2]) ^ m[i - 2])
    for i in range(32):
        v1[i] = m[i] << (31 - i)
    return np.stack([v0, v1]).astype(np.uint32)


_SOBOL_V = _sobol_directions()


def sobol2d(idx, scramble):
    """2D Sobol point for sample `idx` with per-pixel XOR scramble (2,)
    uint32.  idx: (...) uint32."""
    idx = jnp.asarray(idx, jnp.uint32)
    v = jnp.asarray(_SOBOL_V)  # (2, 32)
    bits = ((idx[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & 1).astype(jnp.uint32)
    acc0 = jnp.zeros_like(idx)
    acc1 = jnp.zeros_like(idx)
    for b in range(32):
        acc0 = acc0 ^ jnp.where(bits[..., b] == 1, v[0, b], jnp.uint32(0))
        acc1 = acc1 ^ jnp.where(bits[..., b] == 1, v[1, b], jnp.uint32(0))
    acc0 = acc0 ^ scramble[..., 0]
    acc1 = acc1 ^ scramble[..., 1]
    pts = jnp.stack([acc0, acc1], axis=-1)
    return pts.astype(jnp.float32) * (1.0 / 4294967296.0)


def pixel_offsets(kind, sample_idx, n_samples, pixel_hash, seed):
    """Sub-pixel offsets in [0,1)² for a wavefront.

    kind: static int (UNIFORM/JITTERED/MULTI_JITTERED/SOBOL)
    sample_idx: (...) int32 sample index within the batch
    n_samples: static int — batch size (per reference, batches of ≤256)
    pixel_hash: (...) uint32 unique per pixel
    seed: python int / uint32 global seed
    """
    p = _hash_u32(pixel_hash ^ jnp.uint32(seed))
    s = jnp.asarray(sample_idx, jnp.uint32)
    if kind == UNIFORM:
        return jnp.stack([_randfloat(s * 2, p), _randfloat(s * 2 + 1, p)], axis=-1)
    if kind == JITTERED:
        m = int(np.floor(np.sqrt(n_samples)))
        m = max(m, 1)
        sx = (s % m).astype(jnp.float32)
        sy = ((s // m) % m).astype(jnp.float32)
        jx = _randfloat(s * 2, p)
        jy = _randfloat(s * 2 + 1, p)
        return jnp.stack([(sx + jx) / m, (sy + jy) / m], axis=-1)
    if kind == MULTI_JITTERED:
        m = int(np.floor(np.sqrt(n_samples)))
        m = max(m, 1)
        n = max(n_samples // m, 1)
        return cmj(s % jnp.uint32(m * n), m, n, p)
    if kind == SOBOL:
        scr = jnp.stack([_hash_u32(p), _hash_u32(p ^ jnp.uint32(0x9E3779B9))], axis=-1)
        return sobol2d(s, scr)
    raise ValueError(kind)
