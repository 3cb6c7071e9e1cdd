"""Counter-hash dropout — flax ``nn.Dropout`` drop-in without threefry cost.

A KION-scale SASRec forward draws ~8 dropout masks of (B, L, D) per step;
generating them with ``jax.random.bernoulli`` (threefry2x32) costs ~3.6 ms of
a 22.5 ms train step on a v5e chip (benchmarks/step_decomposition.py) — the
PRNG alone is ~16% of the step. This module derives the mask from a
murmur3-finalizer hash of (key-salt, flat element index) instead: ~10 int32
VPU ops per element that XLA fuses straight into the surrounding elementwise
work. It is the same hash family the fused attention kernel already uses for
its in-kernel probability dropout (ops/attention.py:46-83), so dropout is
bit-identical across TPU hardware, CPU, and Pallas interpret mode.

The RNG contract matches ``nn.Dropout``: each call pulls ``make_rng("dropout")``
(flax folds the module path into the key, so distinct layers get independent
masks) and only the 32-bit key words seed the hash — drawing the key is a
scalar threefry, not a per-element one.
"""

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.attention import _GOLDEN_I32, _dropout_threshold, _fmix32, _mix32_fast


def _key_words(key: jnp.ndarray) -> jnp.ndarray:
    """(2,) int32 salt words from a typed or legacy uint32[2] PRNG key."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    return jax.lax.bitcast_convert_type(key.reshape(-1)[:2], jnp.int32)


def hash_keep_mask(key: jnp.ndarray, shape: tp.Tuple[int, ...], rate: float) -> jnp.ndarray:
    """Boolean keep mask of ``shape``; P(keep) = 1 - rate, pure in (key, index)."""
    words = _key_words(key)
    salt = words[0] ^ (words[1] * np.int32(40503))
    n = int(np.prod(shape))
    pos = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    # single-multiply finalizer: threshold compares are decided by the high
    # bits, which the golden-ratio position multiply + one finalizer multiply
    # avalanche sufficiently (see ops.attention._mix32_fast)
    bits = _mix32_fast((pos * _GOLDEN_I32 + salt).astype(jnp.uint32))
    return bits >= _dropout_threshold(rate)


def hash_uniform_ints(
    key: jnp.ndarray, shape: tp.Tuple[int, ...], low: int, high: int
) -> jnp.ndarray:
    """int32 array of ``shape``, ~uniform on [low, high) — counter-hash draw.

    Replaces per-element threefry for high-volume on-device sampling (the
    sampled-softmax negative draws are (B, L, n_negatives) ints per step).
    Modulo bias is ~(high-low)/2^32 — immaterial for catalog-sized ranges.
    A different salt-mix constant than :func:`hash_keep_mask` keeps negative
    draws decorrelated from dropout masks even under related keys.
    """
    words = _key_words(key)
    salt = words[0] ^ (words[1] * np.int32(48271))
    n = int(np.prod(shape))
    pos = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    bits = _fmix32((pos * _GOLDEN_I32 + salt).astype(jnp.uint32))
    span = np.uint32(high - low)
    return np.int32(low) + (bits % span).astype(jnp.int32)


class HashDropout(nn.Module):
    """``nn.Dropout``-compatible layer backed by :func:`hash_keep_mask`."""

    rate: float
    deterministic: tp.Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: tp.Optional[bool] = None) -> jnp.ndarray:
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        keep = hash_keep_mask(self.make_rng("dropout"), x.shape, self.rate)
        scale = jnp.asarray(1.0 / (1.0 - self.rate), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
