"""HashDropout — the counter-hash replacement for flax nn.Dropout.

The train-path dropout must be cheap (no per-element threefry), deterministic
in the key, independent across layers, and match nn.Dropout's semantics
(inverted scaling, pad-through when deterministic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rectools_tpu.models.nn.dropout import HashDropout, hash_keep_mask


class TestHashKeepMask:
    def test_rate_is_respected(self) -> None:
        mask = hash_keep_mask(jax.random.PRNGKey(0), (100_000,), 0.3)
        assert abs(float(mask.mean()) - 0.7) < 0.01

    def test_pure_in_key_and_shape(self) -> None:
        a = hash_keep_mask(jax.random.PRNGKey(5), (64, 32), 0.5)
        b = hash_keep_mask(jax.random.PRNGKey(5), (64, 32), 0.5)
        assert bool((a == b).all())

    def test_different_keys_differ(self) -> None:
        a = hash_keep_mask(jax.random.PRNGKey(1), (64, 32), 0.5)
        b = hash_keep_mask(jax.random.PRNGKey(2), (64, 32), 0.5)
        assert bool((a != b).any())

    def test_typed_and_legacy_keys_both_work(self) -> None:
        legacy = hash_keep_mask(jax.random.PRNGKey(7), (1000,), 0.5)
        typed = hash_keep_mask(jax.random.key(7), (1000,), 0.5)
        # same seed words -> same mask regardless of key flavor
        assert bool((legacy == typed).all())

    def test_no_adjacent_correlation(self) -> None:
        mask = np.asarray(hash_keep_mask(jax.random.PRNGKey(2), (200_000,), 0.5), dtype=np.float64)
        corr = np.corrcoef(mask[:-1], mask[1:])[0, 1]
        assert abs(corr) < 0.01

    def test_rows_of_nd_mask_are_independent(self) -> None:
        mask = np.asarray(hash_keep_mask(jax.random.PRNGKey(3), (512, 128), 0.5), dtype=np.float64)
        # row means concentrate around 0.5 like iid draws would
        row_means = mask.mean(axis=1)
        assert row_means.std() < 3.0 * (0.5 / np.sqrt(128))
        assert not np.allclose(mask[0], mask[1])


class TestHashDropoutModule:
    def _apply(self, x, rate=0.2, seed=0, deterministic=False):
        return HashDropout(rate=rate).apply(
            {}, x, deterministic=deterministic, rngs={"dropout": jax.random.PRNGKey(seed)}
        )

    def test_inverted_scaling_matches_nn_dropout_semantics(self) -> None:
        x = jnp.ones((64, 50, 32))
        y = self._apply(x, rate=0.2)
        kept = np.asarray(y[y != 0])
        np.testing.assert_allclose(kept, 1.0 / 0.8, rtol=1e-6)
        assert abs(float((y == 0).mean()) - 0.2) < 0.02
        assert abs(float(y.mean()) - 1.0) < 0.02  # unbiased in expectation

    def test_deterministic_passthrough(self) -> None:
        x = jnp.arange(24.0).reshape(4, 6)
        assert bool((HashDropout(rate=0.5).apply({}, x, deterministic=True) == x).all())

    def test_rate_edge_cases(self) -> None:
        x = jnp.ones((8, 8))
        assert bool((self._apply(x, rate=0.0) == x).all())
        assert bool((self._apply(x, rate=1.0) == 0).all())

    def test_merge_param_attribute_style(self) -> None:
        x = jnp.ones((16, 16))
        out = HashDropout(rate=0.5, deterministic=True).apply({}, x)
        assert bool((out == x).all())

    def test_distinct_layers_draw_distinct_masks(self) -> None:
        class Two(nn.Module):
            @nn.compact
            def __call__(self, x):
                a = HashDropout(rate=0.5)(x, deterministic=False)
                b = HashDropout(rate=0.5)(x, deterministic=False)
                return a, b

        x = jnp.ones((64, 64))
        a, b = Two().apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)})
        assert bool(((a == 0) != (b == 0)).any())

    def test_gradient_masked_and_scaled(self) -> None:
        x = jnp.ones((32, 32))

        def f(x):
            return self._apply(x, rate=0.25, seed=3).sum()

        g = jax.grad(f)(x)
        vals = np.unique(np.asarray(g).round(6))
        np.testing.assert_allclose(sorted(vals), [0.0, 1.0 / 0.75], rtol=1e-5)

    def test_bf16_input_stays_bf16(self) -> None:
        x = jnp.ones((16, 16), jnp.bfloat16)
        y = self._apply(x, rate=0.5)
        assert y.dtype == jnp.bfloat16

    def test_same_shape_same_key_identical_across_dtypes(self) -> None:
        xf = jnp.ones((64, 64), jnp.float32)
        xb = jnp.ones((64, 64), jnp.bfloat16)
        yf = self._apply(xf, rate=0.5, seed=9)
        yb = self._apply(xb, rate=0.5, seed=9)
        assert bool(((np.asarray(yf) == 0) == (np.asarray(yb, dtype=np.float32) == 0)).all())


class TestBackboneUsesHashDropout:
    def test_train_forward_runs_and_diverges_from_eval(self) -> None:
        from __graft_entry__ import _build_flagship

        bb = _build_flagship(n_items=50, session_max_len=8, n_factors=16, n_heads=2, n_blocks=1, dropout_rate=0.5)
        x = jnp.asarray(np.random.default_rng(0).integers(1, 50, size=(4, 8)))
        params = bb.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, {"x": x}, deterministic=False
        )["params"]
        out_train = bb.apply(
            {"params": params}, {"x": x}, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
        )
        out_eval = bb.apply({"params": params}, {"x": x}, deterministic=True)
        assert out_train.shape == out_eval.shape
        assert bool((np.asarray(out_train) != np.asarray(out_eval)).any())


class TestHashUniformInts:
    def test_range_and_distribution(self) -> None:
        from rectools_tpu.models.nn.dropout import hash_uniform_ints

        vals = np.asarray(hash_uniform_ints(jax.random.PRNGKey(0), (100_000,), 3, 50))
        assert vals.min() >= 3 and vals.max() < 50
        counts = np.bincount(vals, minlength=50)[3:50]
        # each of the 47 buckets expects ~2128 hits; allow 5 sigma
        expected = 100_000 / 47
        assert np.all(np.abs(counts - expected) < 5 * np.sqrt(expected))

    def test_deterministic_and_key_dependent(self) -> None:
        from rectools_tpu.models.nn.dropout import hash_uniform_ints

        a = hash_uniform_ints(jax.random.PRNGKey(5), (64, 8), 0, 1000)
        b = hash_uniform_ints(jax.random.PRNGKey(5), (64, 8), 0, 1000)
        c = hash_uniform_ints(jax.random.PRNGKey(6), (64, 8), 0, 1000)
        assert bool((a == b).all()) and bool((a != c).any())

    def test_decorrelated_from_keep_mask(self) -> None:
        from rectools_tpu.models.nn.dropout import hash_keep_mask, hash_uniform_ints

        key = jax.random.PRNGKey(9)
        mask = np.asarray(hash_keep_mask(key, (50_000,), 0.5), dtype=np.float64)
        ints = np.asarray(hash_uniform_ints(key, (50_000,), 0, 2), dtype=np.float64)
        corr = np.corrcoef(mask, ints)[0, 1]
        assert abs(corr) < 0.02
