"""Loss-math parity: rectools_tpu's jax losses vs the reference's torch loss
calculators on identical logits/targets/weights (softmax CE with pad-ignore,
BCE over pos+negatives, gBCE calibration, sampled softmax, and the chunked
logsumexp softmax that is this framework's default full-catalog path)."""

import numpy as np
import pytest


def _ref_module_cls():
    from rectools.models.nn.transformers.lightning import TransformerLightningModuleBase

    return TransformerLightningModuleBase


def _fake_ref_self(n_negatives: int, gbce_t: float, n_items: int):
    """Minimal instance carrying only the attributes the loss methods read."""
    import types

    cls = _ref_module_cls()
    self = object.__new__(cls)
    self.data_preparator = types.SimpleNamespace(n_negatives=n_negatives)
    self.gbce_t = gbce_t
    self.item_extra_tokens = ("PAD",)
    self.torch_model = types.SimpleNamespace(
        item_model=types.SimpleNamespace(n_items=n_items + 1)  # incl. PAD
    )
    return self


@pytest.fixture(scope="module")
def batch_arrays():
    rng = np.random.default_rng(13)
    b, l, n_items = 6, 10, 40
    y = rng.integers(0, n_items, size=(b, l))
    y[:, :3] = 0  # padded positions excluded from losses
    w = rng.random((b, l)).astype(np.float32)
    w[y == 0] = 0.0
    full_logits = rng.normal(size=(b, l, n_items)).astype(np.float32)
    cand_logits = rng.normal(size=(b, l, 5)).astype(np.float32)  # pos + 4 negs
    return y, w, full_logits, cand_logits, n_items


class TestSoftmaxLossParity:
    def test_full_catalog_softmax(self, batch_arrays) -> None:
        import torch

        import jax.numpy as jnp

        from rectools_tpu.models.nn.transformers.losses import softmax_loss

        y, w, full_logits, _, _ = batch_arrays
        ref = _ref_module_cls()._calc_softmax_loss(
            torch.from_numpy(full_logits), torch.from_numpy(y), torch.from_numpy(w)
        )
        tpu = softmax_loss(jnp.asarray(full_logits), jnp.asarray(y), jnp.asarray(w))
        assert float(ref) == pytest.approx(float(tpu), rel=1e-5)

    def test_chunked_logsumexp_matches_dense(self, batch_arrays) -> None:
        import torch

        import jax.numpy as jnp

        from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

        y, w, full_logits, _, n_items = batch_arrays
        rng = np.random.default_rng(3)
        d = 16
        sess = rng.normal(size=full_logits.shape[:2] + (d,)).astype(np.float32)
        items = rng.normal(size=(n_items, d)).astype(np.float32)
        dense_logits = sess @ items.T
        ref = _ref_module_cls()._calc_softmax_loss(
            torch.from_numpy(dense_logits), torch.from_numpy(y), torch.from_numpy(w)
        )
        tpu = fused_softmax_loss(jnp.asarray(sess), jnp.asarray(items), jnp.asarray(y), jnp.asarray(w), chunk=16)
        assert float(ref) == pytest.approx(float(tpu), rel=1e-5)


class TestSampledLossParity:
    def test_bce(self, batch_arrays) -> None:
        import torch

        import jax.numpy as jnp

        from rectools_tpu.models.nn.transformers.losses import bce_loss

        y, w, _, cand_logits, _ = batch_arrays
        ref = _ref_module_cls()._calc_bce_loss(
            torch.from_numpy(cand_logits.copy()), torch.from_numpy(y), torch.from_numpy(w)
        )
        tpu = bce_loss(jnp.asarray(cand_logits), jnp.asarray(y), jnp.asarray(w))
        assert float(ref) == pytest.approx(float(tpu), rel=1e-5)

    def test_gbce(self, batch_arrays) -> None:
        import torch

        import jax.numpy as jnp

        from rectools_tpu.models.nn.transformers.losses import gbce_loss

        y, w, _, cand_logits, n_items = batch_arrays
        n_negatives = cand_logits.shape[-1] - 1
        gbce_t = 0.4
        fake = _fake_ref_self(n_negatives, gbce_t, n_items)
        ref = fake._calc_gbce_loss(torch.from_numpy(cand_logits.copy()), torch.from_numpy(y), torch.from_numpy(w))
        tpu = gbce_loss(
            jnp.asarray(cand_logits), jnp.asarray(y), jnp.asarray(w),
            n_actual_items=n_items, n_negatives=n_negatives, gbce_t=gbce_t,
        )
        assert float(ref) == pytest.approx(float(tpu), rel=1e-4)

    def test_sampled_softmax(self, batch_arrays) -> None:
        import torch

        import jax.numpy as jnp

        from rectools_tpu.models.nn.transformers.losses import sampled_softmax_loss

        y, w, _, cand_logits, n_items = batch_arrays
        fake = _fake_ref_self(cand_logits.shape[-1] - 1, 0.2, n_items)
        ref = fake._calc_sampled_softmax_loss(
            torch.from_numpy(cand_logits.copy()), torch.from_numpy(y), torch.from_numpy(w)
        )
        tpu = sampled_softmax_loss(jnp.asarray(cand_logits), jnp.asarray(y), jnp.asarray(w))
        assert float(ref) == pytest.approx(float(tpu), rel=1e-5)
