"""Fused LayerNorm kernel vs the XLA twin (interpret mode stands in for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rectools_tpu.ops.layer_norm import fused_layer_norm, reference_layer_norm


def _inputs(m=300, d=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32) * 2.0 + 0.5)
    gamma = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    return x, gamma, beta


class TestFusedLayerNorm:
    @pytest.mark.parametrize("m,d", [(256, 128), (300, 128), (64, 64), (1000, 256)])
    def test_forward_matches_reference(self, m, d) -> None:
        x, gamma, beta = _inputs(m, d)
        got = fused_layer_norm(x, gamma, beta, 1e-6, 128, True)
        expected = reference_layer_norm(x, gamma, beta, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)

    def test_forward_matches_flax(self) -> None:
        x, gamma, beta = _inputs(200, 128)
        got = fused_layer_norm(x, gamma, beta, 1e-6, 128, True)
        flax_out = nn.LayerNorm().apply({"params": {"scale": gamma, "bias": beta}}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(flax_out), atol=1e-5, rtol=1e-5)

    def test_gradients_match_reference(self) -> None:
        x, gamma, beta = _inputs(192, 128)
        seed = jnp.asarray(np.random.default_rng(1).normal(size=(192, 128)).astype(np.float32))

        def loss_fused(x, g, b):
            return jnp.sum(fused_layer_norm(x, g, b, 1e-6, 128, True) * seed)

        def loss_ref(x, g, b):
            return jnp.sum(reference_layer_norm(x, g, b, 1e-6) * seed)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_nonmultiple_rows_padding(self) -> None:
        x, gamma, beta = _inputs(37, 128)
        got = fused_layer_norm(x, gamma, beta, 1e-6, 16, True)
        expected = reference_layer_norm(x, gamma, beta, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)
        # grads with padding rows present
        g = jax.grad(lambda x: fused_layer_norm(x, gamma, beta, 1e-6, 16, True).sum())(x)
        g_ref = jax.grad(lambda x: reference_layer_norm(x, gamma, beta, 1e-6).sum())(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4, rtol=1e-4)

    def test_bf16_input(self) -> None:
        x, gamma, beta = _inputs(128, 128)
        xb = x.astype(jnp.bfloat16)
        got = fused_layer_norm(xb, gamma, beta, 1e-6, 128, True)
        assert got.dtype == jnp.bfloat16
        expected = reference_layer_norm(xb, gamma, beta, 1e-6)
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32), np.asarray(expected, dtype=np.float32), atol=3e-2, rtol=3e-2
        )

    def test_small_epsilon(self) -> None:
        x, gamma, beta = _inputs(64, 128)
        got = fused_layer_norm(x, gamma, beta, 1e-8, 64, True)
        expected = reference_layer_norm(x, gamma, beta, 1e-8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


class TestFusedLayerNormModule:
    def test_param_tree_matches_nn_layer_norm(self) -> None:
        from rectools_tpu.models.nn.norm import FusedLayerNorm

        x = jnp.ones((4, 8, 32))
        ours = FusedLayerNorm().init(jax.random.PRNGKey(0), x)["params"]
        flax = nn.LayerNorm().init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree.structure(ours) == jax.tree.structure(flax)
        assert all(a.shape == b.shape for a, b in zip(jax.tree.leaves(ours), jax.tree.leaves(flax)))

    def test_module_output_matches_flax_on_cpu(self) -> None:
        from rectools_tpu.models.nn.norm import FusedLayerNorm

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))
        params = {"scale": jnp.asarray(rng.normal(size=(32,)).astype(np.float32)), "bias": jnp.zeros((32,))}
        ours = FusedLayerNorm().apply({"params": params}, x)
        flax_out = nn.LayerNorm().apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_out), atol=1e-5, rtol=1e-5)
