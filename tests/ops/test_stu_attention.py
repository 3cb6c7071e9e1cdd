"""Fused STU attention kernel tests (interpret mode stands in for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectools_tpu.ops.stu_attention import _stu_reference, stu_attention, stu_dot_product_attention


def _inputs(b=2, h=2, l=64, ad=16, lh=16, nb=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, l, ad)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, ad)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, lh)).astype(np.float32))
    ts = jnp.asarray(
        1_600_000_000 + np.sort(rng.integers(0, 86400 * 30, size=(b, l + 2)), axis=1).astype(np.int32)
    )
    tl = jnp.asarray((rng.random((b, l)) > 0.2).astype(np.float32))
    tw = jnp.asarray(rng.normal(size=(nb + 1,)).astype(np.float32) * 0.1)
    pw = jnp.asarray(rng.normal(size=(2 * l - 1,)).astype(np.float32) * 0.1)
    allowed = jnp.tril(jnp.ones((l, l), jnp.float32))[None]
    return q, k, v, ts, tl, tw, pw, allowed


class TestSTUAttention:
    @pytest.mark.parametrize("use_time,use_pos", [(True, True), (True, False), (False, True), (False, False)])
    def test_forward_matches_reference(self, use_time, use_pos) -> None:
        q, k, v, ts, tl, tw, pw, allowed = _inputs()
        ref = _stu_reference(q, k, v, ts, tl, tw, pw, allowed[0], 128, use_time, use_pos)
        got = stu_attention(q, k, v, ts, tl, allowed, tw, pw, 128, use_time, use_pos, 64, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_q_blocking(self) -> None:
        # block_q smaller than L exercises per-block timestamp slicing
        q, k, v, ts, tl, tw, pw, allowed = _inputs(l=96)
        ref = _stu_reference(q, k, v, ts, tl, tw, pw, allowed[0], 128, True, True)
        got = stu_attention(q, k, v, ts, tl, allowed, tw, pw, 128, True, True, 32, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_gradients(self) -> None:
        q, k, v, ts, tl, tw, pw, allowed = _inputs(b=1, l=32)

        def loss_fused(q, tw, pw):
            return jnp.sum(stu_attention(q, k, v, ts, tl, allowed, tw, pw, 128, True, True, 32, True) ** 2)

        def loss_ref(q, tw, pw):
            return jnp.sum(_stu_reference(q, k, v, ts, tl, tw, pw, allowed[0], 128, True, True) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, tw, pw)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, tw, pw)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    @pytest.mark.parametrize("use_time,use_pos", [(True, True), (True, False), (False, True), (False, False)])
    def test_gradients_multihead_all_inputs(self, use_time, use_pos) -> None:
        # multi-batch multi-head exercises the backward kernel's cross-head
        # accumulation of the score gradient used for the weight tables
        q, k, v, ts, tl, tw, pw, allowed = _inputs(b=2, h=2, l=64)

        def loss_fused(q, k, v, tw, pw):
            return jnp.sum(
                stu_attention(q, k, v, ts, tl, allowed, tw, pw, 128, use_time, use_pos, 32, True) ** 2
            )

        def loss_ref(q, k, v, tw, pw):
            return jnp.sum(_stu_reference(q, k, v, ts, tl, tw, pw, allowed[0], 128, use_time, use_pos) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, tw, pw)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, tw, pw)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)

    def test_gradients_padded_q_blocks(self) -> None:
        # L=80 with block_q=32 pads the backward's q-side arrays to 96 rows
        q, k, v, ts, tl, tw, pw, allowed = _inputs(b=1, h=2, l=80)

        def loss_fused(q, k, v, tw, pw):
            return jnp.sum(stu_attention(q, k, v, ts, tl, allowed, tw, pw, 128, True, True, 32, True) ** 2)

        def loss_ref(q, k, v, tw, pw):
            return jnp.sum(_stu_reference(q, k, v, ts, tl, tw, pw, allowed[0], 128, True, True) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, tw, pw)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, tw, pw)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)

    def test_second_precision_timestamps(self) -> None:
        # 1-second deltas at unix-epoch magnitude must land in bucket 0/1
        # (f32 timestamps would collapse them — int32 path keeps them exact)
        q, k, v, _, tl, tw, pw, allowed = _inputs(b=1, l=32)
        base = 1_700_000_000
        ts = jnp.asarray(base + np.arange(34, dtype=np.int32))[None, :]
        ref = _stu_reference(q, k, v, ts, tl, tw, pw, allowed[0], 128, True, False)
        got = stu_attention(q, k, v, ts, tl, allowed, tw, pw, 128, True, False, 32, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_dispatch_cpu_path(self) -> None:
        q, k, v, ts, tl, tw, pw, allowed = _inputs()
        out = stu_dot_product_attention(q, k, v, ts, tl, allowed[0], tw, pw, 128, use_fused=False)
        ref = _stu_reference(q, k, v, ts, tl, tw, pw, allowed[0], 128, True, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
