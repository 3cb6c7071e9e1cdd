"""Grouped exact top-k (ops/topk_select.py): bit-parity with lax.top_k on
benign data, exact-set parity through the certificate fallback on
adversarial layouts. Runs the Pallas kernel in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectools_tpu.ops.topk_select import _group_topm, _pick_m, grouped_exact_top_k


class TestGroupTopM:
    def test_matches_topk_per_row(self) -> None:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        vals, idx = _group_topm(x, m=8, rows_blk=32, interpret=True)
        ref_v, ref_i = jax.lax.top_k(x, 8)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_ties_extract_lowest_index_first(self) -> None:
        x = np.zeros((4, 128), np.float32)
        x[:, [5, 70, 100]] = 7.0  # three-way tie
        vals, idx = _group_topm(jnp.asarray(x), m=4, rows_blk=4, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx)[0, :3], [5, 70, 100])
        np.testing.assert_array_equal(np.asarray(vals)[0], [7.0, 7.0, 7.0, 0.0])

    def test_row_padding(self) -> None:
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(33, 128)).astype(np.float32))  # not a block multiple
        vals, _ = _group_topm(x, m=4, rows_blk=16, interpret=True)
        ref_v, _ = jax.lax.top_k(x, 4)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))


class TestGroupedExactTopK:
    @pytest.mark.parametrize("n,k", [(4096, 100), (15872, 100), (4097, 37), (300, 20), (512, 512)])
    def test_bit_parity_random(self, n: int, k: int) -> None:
        rng = np.random.default_rng(2)
        scores = jnp.asarray(rng.normal(size=(7, n)).astype(np.float32))
        vals, idx = grouped_exact_top_k(scores, k, interpret=True)
        ref_v, ref_i = jax.lax.top_k(scores, k)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_duplicate_values_bit_parity(self) -> None:
        rng = np.random.default_rng(3)
        # heavy ties: scores drawn from 16 distinct values across 4352 cols
        scores = jnp.asarray(rng.integers(0, 16, size=(5, 4352)).astype(np.float32))
        k = 64
        vals, idx = grouped_exact_top_k(scores, k, interpret=True)
        ref_v, ref_i = jax.lax.top_k(scores, k)
        # ties everywhere -> the certificate fires -> default flat fallback,
        # which IS lax.top_k: bit parity still holds
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_adversarial_sorted_row_takes_fallback_and_stays_exact(self) -> None:
        # whole top-k packed into the first group: every group's floor beats
        # nothing, but group 0 hides k elements past m -> must fall back
        n, k = 4096, 100
        base = np.linspace(1000.0, 1.0, n, dtype=np.float32)[None, :]
        scores = jnp.asarray(np.repeat(base, 3, axis=0))
        calls = []

        def spy_fallback(s, kk):
            calls.append(1)
            return jax.lax.top_k(s, kk)

        vals, idx = grouped_exact_top_k(scores, k, fallback=spy_fallback, interpret=True)
        assert calls, "certificate should have routed the sorted row to the fallback"
        ref_v, ref_i = jax.lax.top_k(scores, k)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_unaligned_padding_never_returned(self) -> None:
        rng = np.random.default_rng(4)
        n, k = 4100, 50  # pads to 4224 internally
        scores = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
        _, idx = grouped_exact_top_k(scores, k, interpret=True)
        assert int(np.asarray(idx).max()) < n

    def test_pick_m_covers_k(self) -> None:
        for n_pad, k in [(4096, 512), (15872, 100), (128 * 3, 300)]:
            g = n_pad // 128
            m = _pick_m(n_pad, k)
            assert g * m >= k
            assert m >= 12

    def test_all_equal_rows(self) -> None:
        scores = jnp.ones((2, 4096), jnp.float32)
        vals, idx = grouped_exact_top_k(scores, 10, interpret=True)
        ref_v, ref_i = jax.lax.top_k(scores, 10)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
