"""FusedLayerNorm — ``nn.LayerNorm`` drop-in backed by the Pallas kernel.

Parameter names/shapes match flax ``nn.LayerNorm`` ("scale", "bias") so the
swap is invisible to checkpoints and param trees; math matches flax with
f32 reductions (ops/layer_norm.py). Off-TPU (and for shapes the kernel does
not cover) the XLA twin runs — identical semantics, CI-testable anywhere.
"""

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.layer_norm import fused_layer_norm, reference_layer_norm


class FusedLayerNorm(nn.Module):
    epsilon: float = 1e-6
    use_pallas: tp.Optional[bool] = None  # None = auto (TPU backend)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (d,))
        beta = self.param("bias", nn.initializers.zeros, (d,))
        use_pallas = self.use_pallas
        if use_pallas is None:
            # the kernel wins standalone at any width, but the pallas_call is
            # a fusion barrier for XLA's neighbors: end-to-end it is +0.5 ms
            # at d=128 (KION) and -2.3 ms at d=256 (ML-20M) per train step —
            # auto mode takes the kernel only at narrow dims (PERF_r02.md)
            use_pallas = jax.default_backend() == "tpu" and d <= 128 and x.size // d >= 8
        if use_pallas:
            y = fused_layer_norm(x.reshape(-1, d), gamma, beta, self.epsilon)
            return y.reshape(x.shape)
        return reference_layer_norm(x, gamma, beta, self.epsilon)
