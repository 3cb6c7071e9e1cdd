"""Streaming-logsumexp kernel tests (interpret mode stands in for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectools_tpu.ops.softmax_lse import reference_lse, streaming_lse


def _inputs(m=300, n=1500, d=32, seed=0):
    rng = np.random.default_rng(seed)
    sessions = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    return sessions, items


class TestStreamingLse:
    @pytest.mark.parametrize("m,n", [(256, 1024), (300, 1500), (64, 100)])
    def test_forward_matches_reference(self, m, n) -> None:
        sessions, items = _inputs(m, n)
        got = streaming_lse(sessions, items, None, 128, 512, True)
        expected = reference_lse(sessions, items)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-6)

    @pytest.mark.parametrize("scale", [1.0, 1.5])
    def test_bounded_shift_matches_reference(self, scale) -> None:
        # bounded_shift: the dependency-free fixed-shift kernel the training
        # CE loss opts into; exact while the Cauchy-Schwarz bound gap stays
        # under ~125. scale=1.0 keeps every row in window 1 (gap ~36);
        # scale=1.5 pushes gaps to ~80, exercising the window-2 selection.
        # Beyond the contract (gap > ~125, i.e. max possible |logit| > 125 —
        # a diverged model) the result is -inf, loud by design.
        sessions, items = _inputs(256, 1024)
        got = streaming_lse(sessions * scale, items * scale, None, 128, 512, True, True)
        expected = reference_lse(sessions * scale, items * scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4, rtol=1e-6)

    def test_gradients_match_reference(self) -> None:
        sessions, items = _inputs(192, 700)
        dlse_seed = jnp.asarray(np.random.default_rng(1).normal(size=(192,)).astype(np.float32))

        def loss_fused(s, i):
            return jnp.sum(streaming_lse(s, i, None, 128, 512, True) * dlse_seed)

        def loss_ref(s, i):
            return jnp.sum(reference_lse(s, i) * dlse_seed)

        gf = jax.grad(loss_fused, argnums=(0, 1))(sessions, items)
        gr = jax.grad(loss_ref, argnums=(0, 1))(sessions, items)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_extreme_logits_stable(self) -> None:
        sessions, items = _inputs(64, 256)
        got = streaming_lse(sessions * 50.0, items * 50.0, None, 64, 128, True)
        expected = reference_lse(sessions * 50.0, items * 50.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)

    def test_bf16_inputs(self) -> None:
        sessions, items = _inputs(128, 512)
        got = streaming_lse(sessions.astype(jnp.bfloat16), items.astype(jnp.bfloat16), None, 128, 256, True)
        expected = reference_lse(sessions.astype(jnp.bfloat16), items.astype(jnp.bfloat16))
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-2, rtol=3e-3)


class TestPartialsKernel:
    """The default fwd kernel emits per-chunk (max, sumexp) partials in the
    DMA-optimal grid order and combines them in XLA — exact at any scale."""

    def test_matches_classic_kernel_exactly(self, monkeypatch) -> None:
        import rectools_tpu.ops.softmax_lse as sl

        sessions, items = _inputs(96, 500)
        partials = streaming_lse(sessions, items, None, 64, 128, True)
        monkeypatch.setattr(sl, "_USE_PARTIALS_FWD", False)
        classic = streaming_lse(sessions, items, None, 64, 128, True)
        np.testing.assert_allclose(np.asarray(partials), np.asarray(classic), rtol=1e-6)

    def test_large_upward_max_jump_stays_exact(self) -> None:
        # last chunk holds a logit ~400 above every earlier chunk's max
        rng = np.random.default_rng(3)
        d = 32
        sessions = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
        items = rng.normal(scale=0.1, size=(256, d)).astype(np.float32)
        items[200] = 400.0 * np.asarray(sessions[0] / np.linalg.norm(sessions[0]) ** 2)
        items = jnp.asarray(items)
        got = streaming_lse(sessions, items, None, 8, 64, True)
        expected = reference_lse(sessions, items)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5)

    def test_downward_chunks_exact(self) -> None:
        # later chunks far BELOW the running max exercise the underflow side
        rng = np.random.default_rng(5)
        d = 16
        sessions = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
        items = np.concatenate(
            [
                rng.normal(scale=3.0, size=(64, d)),
                rng.normal(scale=0.001, size=(192, d)),
            ]
        ).astype(np.float32)
        got = streaming_lse(sessions, jnp.asarray(items), None, 4, 64, True)
        expected = reference_lse(sessions, jnp.asarray(items))
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


class TestRowBiasAndSharding:
    def test_row_bias_excludes_rows(self) -> None:
        sessions, items = _inputs(64, 300)
        bias = jnp.where(jnp.arange(300) < 200, 0.0, -1e30).astype(jnp.float32)
        got = streaming_lse(sessions, items, bias, 64, 128, True)
        expected = reference_lse(sessions, items[:200])
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-6)

    def test_bias_nonresident_path_matches(self, monkeypatch) -> None:
        """Above _BIAS_RESIDENT_BUDGET the bias switches to per-chunk DMA
        blocks; value and both gradients must be identical to the resident
        spec (same sums, different data movement)."""
        import rectools_tpu.ops.softmax_lse as sl

        sessions, items = _inputs(64, 300)
        bias = jnp.asarray(np.random.default_rng(5).normal(size=(300,)).astype(np.float32))
        dl = jnp.asarray(np.random.default_rng(6).normal(size=(64,)).astype(np.float32))

        def loss(s, i):
            return jnp.sum(streaming_lse(s, i, bias, 64, 128, True) * dl)

        resident_val = loss(sessions, items)
        resident_grads = jax.grad(loss, argnums=(0, 1))(sessions, items)

        monkeypatch.setattr(sl, "_BIAS_RESIDENT_BUDGET", 0)
        chunked_val = loss(sessions, items)
        chunked_grads = jax.grad(loss, argnums=(0, 1))(sessions, items)

        np.testing.assert_allclose(np.asarray(chunked_val), np.asarray(resident_val), rtol=1e-6)
        for a, b in zip(chunked_grads, resident_grads):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)

    def test_sharded_matches_dense(self) -> None:
        import pytest as _pytest

        if len(jax.devices()) < 8:
            _pytest.skip("needs 8 virtual devices")
        from rectools_tpu.ops.softmax_lse import sharded_streaming_lse
        from rectools_tpu.parallel import MODEL_AXIS, make_mesh

        sessions, items = _inputs(128, 1000)  # 1000 not divisible by 8 -> shard pads
        mesh = make_mesh(n_data=1, n_model=8)
        got = sharded_streaming_lse(sessions, items, mesh, MODEL_AXIS, block_m=64, chunk_n=128, interpret=True)
        expected = reference_lse(sessions, items)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-6)

    def test_sharded_gradients_match_dense(self) -> None:
        import pytest as _pytest

        if len(jax.devices()) < 8:
            _pytest.skip("needs 8 virtual devices")
        from rectools_tpu.ops.softmax_lse import sharded_streaming_lse
        from rectools_tpu.parallel import MODEL_AXIS, make_mesh

        sessions, items = _inputs(96, 500)
        mesh = make_mesh(n_data=1, n_model=8)
        dl = jnp.asarray(np.random.default_rng(2).normal(size=(96,)).astype(np.float32))

        def loss_sharded(s, i):
            return jnp.sum(sharded_streaming_lse(s, i, mesh, MODEL_AXIS, block_m=64, chunk_n=64, interpret=True) * dl)

        def loss_ref(s, i):
            return jnp.sum(reference_lse(s, i) * dl)

        gf = jax.grad(loss_sharded, argnums=(0, 1))(sessions, items)
        gr = jax.grad(loss_ref, argnums=(0, 1))(sessions, items)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


class TestBf16Gradients:
    def test_bf16_gradients_close_to_f32(self) -> None:
        """Backward matmul operands follow the input dtype (bf16 rate on MXU,
        f32 accumulation): gradients must stay within bf16 rounding of the
        exact f32 path."""
        sessions, items = _inputs(192, 700)
        dlse_seed = jnp.asarray(np.random.default_rng(2).normal(size=(192,)).astype(np.float32))

        def loss(s, i):
            return jnp.sum(streaming_lse(s, i, None, 128, 256, True) * dlse_seed)

        gf32 = jax.grad(loss, argnums=(0, 1))(sessions, items)
        gbf16 = jax.grad(
            lambda s, i: loss(s.astype(jnp.bfloat16), i.astype(jnp.bfloat16)), argnums=(0, 1)
        )(sessions, items)
        for a, b in zip(gbf16, gf32):
            # relative tolerance ~ bf16 epsilon x accumulation effects
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)
        # and the bf16 grads are not degenerate (zero / nan)
        for a in gbf16:
            arr = np.asarray(a, dtype=np.float32)
            assert np.isfinite(arr).all()
            assert np.abs(arr).max() > 0


class TestWorkDtypePath:
    def test_fused_loss_bf16_towers_match_f32(self) -> None:
        """fused_softmax_loss with bf16 towers (the compute_dtype='bfloat16'
        training path) matches the f32 value within bf16 input rounding."""
        from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

        rng = np.random.default_rng(3)
        b, length, d, n = 4, 12, 32, 600
        s_t = jnp.asarray(rng.normal(size=(b, length, d)).astype(np.float32))
        i_t = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, n, size=(b, length)))
        y = y.at[0, :3].set(0)  # padding rows ignored
        w = jnp.asarray(rng.uniform(0.5, 1.0, size=(b, length)).astype(np.float32))
        f32 = fused_softmax_loss(s_t, i_t, y, w, chunk=256)
        bf16 = fused_softmax_loss(s_t.astype(jnp.bfloat16), i_t.astype(jnp.bfloat16), y, w, chunk=256)
        np.testing.assert_allclose(float(bf16), float(f32), rtol=2e-2)


class TestFusedBackwardPaths:
    """The fused single-pass backward and the two-pass fallback must agree."""

    def test_fallback_two_pass_matches_fused(self, monkeypatch) -> None:
        import rectools_tpu.ops.softmax_lse as mod

        sessions, items = _inputs(192, 700)
        dlse_seed = jnp.asarray(np.random.default_rng(2).normal(size=(192,)).astype(np.float32))

        def loss(s, i):
            return jnp.sum(streaming_lse(s, i, None, 128, 512, True) * dlse_seed)

        g_fused = jax.grad(loss, argnums=(0, 1))(sessions, items)
        monkeypatch.setattr(mod, "_FUSED_BWD_PARTIALS_BUDGET", 0)
        g_split = jax.grad(loss, argnums=(0, 1))(sessions, items)
        for a, b in zip(g_fused, g_split):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

    def test_fused_bwd_with_row_bias_and_padding(self) -> None:
        # non-multiple shapes exercise both session and item padding in the
        # fused kernel; biased-out rows must receive zero gradient
        sessions, items = _inputs(100, 333)
        bias = jnp.where(jnp.arange(333) < 300, 0.0, -1e30).astype(jnp.float32)
        dlse_seed = jnp.asarray(np.random.default_rng(3).normal(size=(100,)).astype(np.float32))

        def loss_fused(s, i):
            return jnp.sum(streaming_lse(s, i, bias, 64, 128, True) * dlse_seed)

        def loss_ref(s, i):
            return jnp.sum(reference_lse(s, i[:300]) * dlse_seed)

        gf = jax.grad(loss_fused, argnums=(0, 1))(sessions, items)
        gr = jax.grad(loss_ref, argnums=(0, 1))(sessions, items)  # rows >= 300 are zero
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gf[1][300:]), 0.0, atol=1e-6)


class TestSoftmaxGradsFromZ:
    """The nonnegative-cotangent backward (softmax_grads_from_z) and the
    loss-level VJP built on it (losses._fused_ce_pallas)."""

    @pytest.mark.parametrize("m,n", [(300, 1500), (64, 100), (256, 1024)])
    def test_matches_dense_math(self, m, n) -> None:
        from rectools_tpu.ops.softmax_lse import softmax_grads_from_z

        sessions, items = _inputs(m, n)
        z = reference_lse(sessions, items) + 0.3  # any finite per-row shift
        ds, di = softmax_grads_from_z(sessions, items, z, 128, 512, True)
        p = jnp.exp(jnp.einsum("md,nd->mn", sessions, items) - z[:, None])
        np.testing.assert_allclose(np.asarray(ds), np.asarray(p @ items), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(di), np.asarray(p.T @ sessions), rtol=2e-5, atol=1e-5)

    def test_inf_z_rows_vanish(self) -> None:
        from rectools_tpu.ops.softmax_lse import softmax_grads_from_z

        sessions, items = _inputs(64, 200)
        z = reference_lse(sessions, items).at[:10].set(jnp.inf)
        ds, di = softmax_grads_from_z(sessions, items, z, 32, 64, True)
        assert np.all(np.asarray(ds)[:10] == 0)
        assert np.all(np.isfinite(np.asarray(di)))

    def test_split_fallback_matches_fused(self, monkeypatch) -> None:
        import rectools_tpu.ops.softmax_lse as sl

        sessions, items = _inputs(128, 700)
        z = reference_lse(sessions, items) + 0.1
        fused = sl.softmax_grads_from_z(sessions, items, z, 64, 256, True)
        monkeypatch.setattr(sl, "_FUSED_BWD_PARTIALS_BUDGET", 0)
        split = sl.softmax_grads_from_z(sessions, items, z, 64, 256, True)
        for a, b in zip(fused, split):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)


class TestSoftmaxCeGradsFromZ:
    """The fully-fused CE backward: (P - coeff*onehot(y)) applied in-kernel."""

    @pytest.mark.parametrize("m,n", [(300, 1500), (64, 100), (100, 333)])
    def test_matches_dense_math(self, m, n) -> None:
        from rectools_tpu.ops.softmax_lse import softmax_ce_grads_from_z

        rng = np.random.default_rng(7)
        sessions, items = _inputs(m, n)
        z = reference_lse(sessions, items) + 0.25
        y = jnp.asarray(rng.integers(0, n, size=(m,)), jnp.int32)
        coeff = jnp.asarray(rng.uniform(0, 1, size=(m,)).astype(np.float32)).at[:3].set(0.0)
        ds, di = softmax_ce_grads_from_z(sessions, items, z, y, coeff, 128, 512, True)
        p = jnp.exp(jnp.einsum("md,nd->mn", sessions, items) - z[:, None])
        pc = p - coeff[:, None] * jax.nn.one_hot(y, n)
        np.testing.assert_allclose(np.asarray(ds), np.asarray(pc @ items), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(di), np.asarray(pc.T @ sessions), rtol=2e-5, atol=1e-5)

    def test_split_fallback_matches_fused(self, monkeypatch) -> None:
        import rectools_tpu.ops.softmax_lse as sl

        rng = np.random.default_rng(8)
        sessions, items = _inputs(128, 700)
        z = reference_lse(sessions, items) + 0.1
        y = jnp.asarray(rng.integers(0, 700, size=(128,)), jnp.int32)
        coeff = jnp.asarray(rng.uniform(0, 1, size=(128,)).astype(np.float32))
        fused = sl.softmax_ce_grads_from_z(sessions, items, z, y, coeff, 64, 256, True)
        monkeypatch.setattr(sl, "_FUSED_BWD_PARTIALS_BUDGET", 0)
        split = sl.softmax_ce_grads_from_z(sessions, items, z, y, coeff, 64, 256, True)
        for a, b in zip(fused, split):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)


class TestFusedCePallasVjp:
    """Loss-level VJP: value and all gradients match the dense XLA softmax CE,
    including a negated upstream cotangent (scalar sign folding)."""

    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_matches_dense_ce(self, sign, monkeypatch) -> None:
        import rectools_tpu.ops.softmax_lse as sl
        from rectools_tpu.models.nn.transformers.losses import _fused_ce_pallas, softmax_loss

        orig_lse, orig_gz = sl.streaming_lse, sl.softmax_grads_from_z
        monkeypatch.setattr(
            sl,
            "streaming_lse",
            lambda s, i, b, bm, cn, interpret=False, bounded_shift=False: orig_lse(
                s, i, b, bm, cn, True, bounded_shift
            ),
        )
        monkeypatch.setattr(
            sl, "softmax_grads_from_z", lambda s, i, z, bm, cn, interpret=False: orig_gz(s, i, z, bm, cn, True)
        )
        orig_ce_gz = sl.softmax_ce_grads_from_z
        monkeypatch.setattr(
            sl,
            "softmax_ce_grads_from_z",
            lambda s, i, z, y, c, bm, cn, interpret=False: orig_ce_gz(s, i, z, y, c, bm, cn, True),
        )
        rng = np.random.default_rng(0)
        b, length, d, n = 4, 7, 16, 50
        s = jnp.asarray(rng.normal(size=(b, length, d)).astype(np.float32))
        items = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, n, size=(b, length)))
        w = jnp.asarray(rng.uniform(0, 2, size=(b, length)).astype(np.float32)).at[0, 0].set(0.0)

        def ref(s_, i_, w_):
            return sign * softmax_loss(jnp.einsum("bld,nd->bln", s_, i_), y, w_)

        def fast(s_, i_, w_):
            return sign * _fused_ce_pallas(s_.reshape(-1, d), i_, y.reshape(-1), w_.reshape(-1), 8, 16)

        np.testing.assert_allclose(float(ref(s, items, w)), float(fast(s, items, w)), rtol=1e-5)
        g_ref = jax.grad(ref, argnums=(0, 1, 2))(s, items, w)
        g_fast = jax.grad(fast, argnums=(0, 1, 2))(s, items, w)
        for name, a, b_ in zip(("s", "items", "w"), g_ref, g_fast):
            np.testing.assert_allclose(
                np.asarray(a).reshape(-1), np.asarray(b_).reshape(-1), rtol=2e-4, atol=1e-6, err_msg=name
            )
