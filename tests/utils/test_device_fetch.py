"""materialize_batches: grouped device->host fetch for serving loops."""

import jax.numpy as jnp
import numpy as np

from rectools_tpu.utils.device_fetch import materialize_batches


class TestMaterializeBatches:
    def test_round_trips_values_in_order(self) -> None:
        rng = np.random.default_rng(0)
        batches = [
            (rng.normal(size=(8, 3)).astype(np.float32), rng.integers(0, 9, (8, 2))),
            (rng.normal(size=(8, 3)).astype(np.float32), rng.integers(0, 9, (8, 2))),
            (rng.normal(size=(4, 3)).astype(np.float32), rng.integers(0, 9, (4, 2))),  # tail shape
        ]
        pending = [tuple(jnp.asarray(a) for a in b) for b in batches]
        out = materialize_batches(pending)
        assert len(out) == 3
        for (exp_a, exp_b), (got_a, got_b) in zip(batches, out):
            np.testing.assert_array_equal(exp_a, got_a)
            np.testing.assert_array_equal(exp_b, got_b)

    def test_empty(self) -> None:
        assert materialize_batches([]) == []

    def test_single_field(self) -> None:
        pending = [(jnp.arange(5),), (jnp.arange(5) + 5,)]
        out = materialize_batches(pending)
        np.testing.assert_array_equal(out[0][0], np.arange(5))
        np.testing.assert_array_equal(out[1][0], np.arange(5) + 5)

    def test_byte_cap_bounds_group_size(self) -> None:
        rng = np.random.default_rng(1)
        batches = [
            (rng.normal(size=(16, 4)).astype(np.float32), rng.integers(0, 9, (16,)))
            for _ in range(7)
        ]
        pending = [tuple(jnp.asarray(a) for a in b) for b in batches]
        one_batch_bytes = 16 * 4 * 4 + 16 * 8
        # cap of ~2 batches forces chunked fetches; order and values must survive
        out = materialize_batches(pending, max_group_bytes=2 * one_batch_bytes)
        assert len(out) == 7
        for (exp_a, exp_b), (got_a, got_b) in zip(batches, out):
            np.testing.assert_array_equal(exp_a, got_a)
            np.testing.assert_array_equal(exp_b, got_b)

    def test_cap_smaller_than_one_batch_degrades_to_per_batch(self) -> None:
        pending = [(jnp.arange(1000),), (jnp.arange(1000) + 1,)]
        out = materialize_batches(pending, max_group_bytes=8)
        np.testing.assert_array_equal(out[0][0], np.arange(1000))
        np.testing.assert_array_equal(out[1][0], np.arange(1000) + 1)
