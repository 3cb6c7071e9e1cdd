"""Fused attention kernel tests: numeric parity with the jnp reference path,
gradient correctness through the Pallas backward kernel, and in-kernel
dropout (interpret mode stands in for TPU on CPU CI; the counter-based
dropout mask is bit-identical across backends, so these tests pin TPU
behavior exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectools_tpu.ops.attention import (
    _reference_attention,
    dot_product_attention,
    dropout_keep_mask,
    fused_attention,
)

SEED = jnp.array([1234], dtype=jnp.int32)
NO_SEED = jnp.zeros((1,), dtype=jnp.int32)


def _inputs(b=2, h=2, l=128, dh=64, bias_b=1, bias_h=1, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, l, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, dh)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(bias_b, bias_h, l, l)).astype(np.float32))
    return q, k, v, bias


class TestFusedAttention:
    @pytest.mark.parametrize("bias_b,bias_h", [(1, 1), (2, 1), (1, 2), (2, 2)])
    def test_forward_matches_reference(self, bias_b, bias_h) -> None:
        q, k, v, bias = _inputs(bias_b=bias_b, bias_h=bias_h)
        scale = 1.0 / np.sqrt(q.shape[-1])
        got = fused_attention(q, k, v, bias, NO_SEED, scale, 0.0, 64, True)  # interpret mode
        expected, _ = _reference_attention(q, k, v, bias, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

    def test_causal_mask_bias(self) -> None:
        q, k, v, _ = _inputs(l=64)
        l = q.shape[2]
        causal = jnp.where(jnp.tril(jnp.ones((l, l), bool)), 0.0, -1e9)[None, None]
        scale = 0.125
        got = fused_attention(q, k, v, causal, NO_SEED, scale, 0.0, 64, True)
        expected, _ = _reference_attention(q, k, v, causal, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

    def test_non_divisible_length_blocks(self) -> None:
        # L=96 with block_q=64 exercises the remainder q block (fwd and bwd)
        q, k, v, bias = _inputs(l=96)
        scale = 0.1
        got = fused_attention(q, k, v, bias, NO_SEED, scale, 0.0, 64, True)
        expected, _ = _reference_attention(q, k, v, bias, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

        def loss_fused(q, k, v):
            return jnp.sum(fused_attention(q, k, v, bias, NO_SEED, scale, 0.0, 64, True) ** 2)

        def loss_ref(q, k, v):
            out, _ = _reference_attention(q, k, v, bias, scale)
            return jnp.sum(out**2)

        for gf, gr in zip(
            jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v),
            jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v),
        ):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)

    @pytest.mark.parametrize("bias_b,bias_h", [(1, 1), (2, 1)])
    def test_gradients_match_reference(self, bias_b, bias_h) -> None:
        q, k, v, bias = _inputs(b=2, h=2, l=64, dh=32, bias_b=bias_b, bias_h=bias_h)
        scale = 1.0 / np.sqrt(32)

        def loss_fused(q, k, v, bias):
            return jnp.sum(fused_attention(q, k, v, bias, NO_SEED, scale, 0.0, 64, True) ** 2)

        def loss_ref(q, k, v, bias):
            out, _ = _reference_attention(q, k, v, bias, scale)
            return jnp.sum(out**2)

        grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
        grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for gf, gr in zip(grads_fused, grads_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)

    def test_bias_grad_opt_out_returns_zeros(self) -> None:
        q, k, v, bias = _inputs(b=1, h=1, l=64, dh=32)
        scale = 0.2

        def loss(bias):
            return jnp.sum(fused_attention(q, k, v, bias, NO_SEED, scale, 0.0, 64, True, False) ** 2)

        db = jax.grad(loss)(bias)
        assert float(jnp.abs(db).max()) == 0.0


class TestInKernelDropout:
    def test_mask_statistics_and_determinism(self) -> None:
        rate = 0.3
        mask = dropout_keep_mask(SEED, jnp.int32(3), jnp.int32(0), 256, 256, rate)
        keep_frac = float(mask.mean())
        assert abs(keep_frac - (1.0 - rate)) < 0.01
        mask2 = dropout_keep_mask(SEED, jnp.int32(3), jnp.int32(0), 256, 256, rate)
        assert bool((mask == mask2).all())
        # different bh rows decorrelate
        other = dropout_keep_mask(SEED, jnp.int32(4), jnp.int32(0), 256, 256, rate)
        assert not bool((mask == other).all())

    def test_mask_tiles_agree_with_full_mask(self) -> None:
        # blockwise regeneration (as the kernels do) must reproduce slices of
        # the full mask
        rate = 0.2
        full = dropout_keep_mask(SEED, jnp.int32(1), jnp.int32(0), 128, 96, rate)
        tile = dropout_keep_mask(SEED, jnp.int32(1), jnp.int32(64), 64, 96, rate)
        np.testing.assert_array_equal(np.asarray(full[64:]), np.asarray(tile))

    def test_forward_dropout_matches_reference_bits(self) -> None:
        q, k, v, bias = _inputs(l=128)
        scale = 0.125
        rate = 0.25
        got = fused_attention(q, k, v, bias, SEED, scale, rate, 64, True)
        expected, _ = _reference_attention(q, k, v, bias, scale, rate, SEED)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

    def test_dropout_grads_match_reference(self) -> None:
        q, k, v, bias = _inputs(b=1, h=2, l=96, dh=32)
        scale = 1.0 / np.sqrt(32)
        rate = 0.35

        def loss_fused(q, k, v):
            return jnp.sum(fused_attention(q, k, v, bias, SEED, scale, rate, 64, True, False) ** 2)

        def loss_ref(q, k, v):
            out, _ = _reference_attention(q, k, v, bias, scale, rate, SEED)
            return jnp.sum(out**2)

        grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr in zip(grads_fused, grads_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)

    def test_dropout_zero_rate_is_exact(self) -> None:
        q, k, v, bias = _inputs(l=64)
        out_zero = fused_attention(q, k, v, bias, SEED, 0.2, 0.0, 64, True)
        out_none = fused_attention(q, k, v, bias, NO_SEED, 0.2, 0.0, 64, True)
        np.testing.assert_array_equal(np.asarray(out_zero), np.asarray(out_none))


class TestDispatch:
    def test_dispatch_layout(self) -> None:
        # (B, L, H, dh) layout entry point; CPU backend -> jnp path
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 16, 2, 8)).astype(np.float32))
        out = dot_product_attention(q, q, q, None, 0.35, use_fused=False)
        assert out.shape == q.shape
        out_fused = dot_product_attention(q, q, q, None, 0.35, use_fused=None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_fused), atol=1e-5)

    def test_dropout_requires_seed(self) -> None:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, 16, 1, 8)).astype(np.float32))
        with pytest.raises(ValueError):
            dot_product_attention(q, q, q, None, 0.35, dropout_rate=0.1)


class TestDefaultTrainingPathUsesKernel:
    """Pin the dispatch: the default training config (dropout_rate=0.2) must
    route through the fused kernel on TPU — this was regression W1 of round 1
    (kernel silently bypassed whenever dropout was on)."""

    def test_dot_product_attention_dispatches_fused_with_dropout(self, monkeypatch) -> None:
        from rectools_tpu.ops import attention as attn_mod

        calls = {}

        def fake_fused(q, k, v, bias, seed, scale, dropout_rate, block_q, interpret, bias_has_grad):
            calls["dropout_rate"] = dropout_rate
            calls["seed"] = seed
            return q

        monkeypatch.setattr(attn_mod, "fused_attention", fake_fused)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 16, 2, 8)).astype(np.float32))
        seed = jnp.array([5], jnp.int32)
        attn_mod.dot_product_attention(
            q, q, q, None, 0.3, use_fused=True, dropout_rate=0.2, dropout_seed=seed
        )
        assert calls["dropout_rate"] == 0.2
        assert calls["seed"] is seed

    def test_mha_training_passes_dropout_to_kernel(self, monkeypatch) -> None:
        from rectools_tpu.models.nn.transformers import net_blocks

        calls = {}

        def fake_attention(q, k, v, bias, scale, use_fused=None, dropout_rate=0.0, dropout_seed=None, **kw):
            calls["dropout_rate"] = dropout_rate
            calls["has_seed"] = dropout_seed is not None
            return q

        monkeypatch.setattr(net_blocks, "dot_product_attention", fake_attention)
        mha = net_blocks.MultiHeadAttention(n_factors=16, n_heads=2, dropout_rate=0.2)
        x = jnp.ones((2, 8, 16), jnp.float32)
        params = mha.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                          x, x, x, None, deterministic=False)
        mha.apply(params, x, x, x, None, False, rngs={"dropout": jax.random.PRNGKey(2)})
        assert calls["dropout_rate"] == 0.2
        assert calls["has_seed"]
        # and inference stays dropout-free
        mha.apply(params, x, x, x, None, True)
        assert calls["dropout_rate"] == 0.0


class TestGroupedPrograms:
    """Row-grouped kernel layouts (G batch*head rows per program)."""

    @pytest.mark.parametrize("bias_b,bias_h", [(2, 1), (1, 4), (2, 4), (1, 1)])
    def test_group_smaller_than_heads(self, monkeypatch, bias_b, bias_h) -> None:
        # force G=2 with H=4 to exercise the H % G == 0 bias layouts
        import rectools_tpu.ops.attention as attention_mod

        monkeypatch.setattr(attention_mod, "_GROUP_CANDIDATES", (2,))
        q, k, v, bias = _inputs(b=2, h=4, l=64, dh=32, bias_b=bias_b, bias_h=bias_h)
        scale = 1.0 / np.sqrt(32)

        def loss_fused(q, k, v):
            return jnp.sum(fused_attention(q, k, v, bias, NO_SEED, scale, 0.0, 64, True, False) ** 2)

        def loss_ref(q, k, v):
            out, _ = _reference_attention(q, k, v, bias, scale)
            return jnp.sum(out**2)

        np.testing.assert_allclose(
            np.asarray(fused_attention(q, k, v, bias, NO_SEED, scale, 0.0, 64, True, False)),
            np.asarray(_reference_attention(q, k, v, bias, scale)[0]),
            atol=1e-5,
        )
        for gf, gr in zip(
            jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v),
            jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v),
        ):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)

    @pytest.mark.parametrize("bias_b,bias_h", [(2, 1), (1, 4)])
    def test_group_larger_than_heads_with_dropout(self, bias_b, bias_h) -> None:
        # default picker groups all 8 rows (G=8, H=4): G % H == 0 layouts,
        # dropout bits must still match the XLA full-mask path exactly
        q, k, v, bias = _inputs(b=2, h=4, l=64, dh=32, bias_b=bias_b, bias_h=bias_h)
        scale = 1.0 / np.sqrt(32)
        got = fused_attention(q, k, v, bias, SEED, scale, 0.3, 64, True, False)
        expected, _ = _reference_attention(q, k, v, bias, scale, 0.3, SEED)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

    def test_group_layout_helper(self) -> None:
        from rectools_tpu.ops.attention import _bias_group_layout

        # shared bias: single row regardless of grouping
        rows, block_of, row_of = _bias_group_layout(1, 1, 4, 8)
        assert (rows, block_of(3), row_of(5)) == (1, 0, 0)
        # per-batch, G >= H: one bias row per batch in the group
        rows, block_of, row_of = _bias_group_layout(8, 1, 4, 8)
        assert (rows, block_of(2), row_of(5)) == (2, 2, 1)
        # per-batch, G < H: all G rows share one batch
        rows, block_of, row_of = _bias_group_layout(8, 1, 4, 2)
        assert (rows, block_of(3), row_of(1)) == (1, 1, 0)
        # per-head, G >= H: all H rows resident, row = g % H
        rows, block_of, row_of = _bias_group_layout(1, 4, 4, 8)
        assert (rows, block_of(7), row_of(6)) == (4, 0, 2)
        # per-head, G < H: G consecutive head rows
        rows, block_of, row_of = _bias_group_layout(1, 4, 4, 2)
        assert (rows, block_of(3), row_of(1)) == (2, 1, 1)

    def test_shape_dispatch_prefers_xla_at_short_l(self) -> None:
        # measured crossover (benchmarks/attention_micro.py): XLA wins below
        # L~512; Pallas wins at long L or when score tensors outgrow HBM
        from rectools_tpu.ops.attention import _prefer_xla_attention

        assert _prefer_xla_attention(512, 4, 100)  # headline shape (82 MB scores)
        assert _prefer_xla_attention(256, 8, 200)  # ML-20M B=256 (327 MB) stays XLA
        assert not _prefer_xla_attention(128, 4, 256)  # grouped kernel ties XLA here
        assert not _prefer_xla_attention(32, 4, 512)
        assert not _prefer_xla_attention(8, 4, 1024)
        # memory-bound shapes go to Pallas even at short L: the XLA backward
        # holds ~5 score-sized tensors per block (OOMs 16 GB at 655 MB scores)
        assert not _prefer_xla_attention(512, 8, 200)
        assert not _prefer_xla_attention(16384, 8, 300)


class TestXlaAttentionRecomputeVjp:
    """The XLA-path recompute VJP (ops/attention.xla_attention) must match
    plain autodiff through the same math — it trades residual traffic for a
    score recompute, not different numerics."""

    @pytest.mark.parametrize("dropout_rate", [0.0, 0.3])
    def test_grads_match_autodiff(self, dropout_rate) -> None:
        from rectools_tpu.ops.attention import _reference_attention, xla_attention

        rng = np.random.default_rng(0)
        b, h, l, dh = 3, 2, 12, 8
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, dh)).astype(np.float32)) for _ in range(3))
        bias = jnp.where(jnp.tril(jnp.ones((l, l), bool)), 0.0, -1e30)[None, None]
        seed = jnp.asarray([7], jnp.int32)
        scale = 1.0 / np.sqrt(dh)

        def via_autodiff(q_, k_, v_):
            out, _ = _reference_attention(q_, k_, v_, bias, scale, dropout_rate, seed)
            return (out.astype(jnp.float32) ** 2).sum()

        def via_vjp(q_, k_, v_):
            out = xla_attention(q_, k_, v_, bias, seed, scale, dropout_rate)
            return (out.astype(jnp.float32) ** 2).sum()

        np.testing.assert_allclose(float(via_autodiff(q, k, v)), float(via_vjp(q, k, v)), rtol=1e-6)
        g_ref = jax.grad(via_autodiff, argnums=(0, 1, 2))(q, k, v)
        g_vjp = jax.grad(via_vjp, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip(("dq", "dk", "dv"), g_ref, g_vjp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5, err_msg=name)
