"""Training module: the TPU-native replacement for the reference's
pytorch-lightning module (rectools/models/nn/transformers/lightning.py:34-449).

One jit-compiled train step (forward + loss + Adam update, donated state) runs
the whole optimization on device; the host only streams fixed-shape numpy
batches. Loss math, Adam hyper-parameters (betas 0.9/0.98), Xavier-normal
init of all >1-dim parameters, validation on the last position only, and the
u2i/i2i recommend paths all follow the reference.
"""

import typing as tp
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ...base import InternalRecoTriplet
from ...rank import Distance, TPURanker
from ....dataset.dataset import Dataset, DatasetSchemaDict
from ....parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from ....types import ExternalIds
from .backbone import TransformerBackboneBase
from .data_preparator import Batch, BatchLoader, TransformerDataPreparatorBase
from .losses import (
    bce_loss,
    fused_softmax_loss,
    gbce_loss,
    requires_negatives,
    sampled_softmax_loss,
    softmax_loss,
)

Params = tp.Any

# parameter names sharded over the model axis: the big item-vocabulary tables
# (id embeddings and categorical-feature embeddings). They shard over the
# FEATURE dimension (n_factors), which is a power of two by construction —
# vocabulary sizes are arbitrary (n_items + extra tokens) and row-sharding
# them would require padded vocabularies with masked logits. With the
# contraction dim sharded, XLA turns the full-catalog logits einsum into
# partial products + a psum over ICI (SURVEY.md §2.9 TP plan).
_MODEL_SHARDED_PARAM_NAMES = ("ids_emb", "cat_emb")


def _xavier_normal_reinit(params: Params, rng: jax.Array) -> Params:
    """Re-init every parameter with ndim > 1 from Xavier-normal, mirroring the
    reference's on_train_start hook (lightning.py:296-299, 366-369).

    Dense-style BIASES get the torch ``Linear`` default
    ``U(-1/sqrt(fan_in), +1/sqrt(fan_in))``: the reference's Xavier pass only
    touches dim>1 parameters, so its models train with torch's nonzero
    bias defaults while flax Dense biases start at zero. This was the one
    initializer-distribution deviation between the stacks, and it is load-
    bearing — the r5 full-scale temporal probe
    (benchmarks/results_bias_init_probe.json) measured HSTU recall@10
    +0.040/+0.011/(seed 60/61) from matching it. LayerNorm scales/biases and
    1-D bias tables are left alone (both stacks agree there)."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(rng, len(leaves))
    new_leaves = []
    for leaf, key in zip(leaves, keys):
        if hasattr(leaf, "ndim") and leaf.ndim > 1:
            fan_out = leaf.shape[0]
            fan_in = int(np.prod(leaf.shape[1:]))
            std = float(np.sqrt(2.0 / (fan_in + fan_out)))
            new_leaves.append(jax.random.normal(key, leaf.shape, leaf.dtype) * std)
        else:
            new_leaves.append(leaf)
    params = jax.tree.unflatten(treedef, new_leaves)

    bias_key = [jax.random.fold_in(rng, 0x7B1A5)]

    def _walk(node):
        if isinstance(node, dict):
            if (
                "kernel" in node
                and "bias" in node
                and getattr(node["bias"], "ndim", 0) == 1
                and getattr(node["kernel"], "ndim", 0) >= 2
            ):
                bound = float(1.0 / np.sqrt(node["kernel"].shape[0]))
                bias_key[0], sub = jax.random.split(bias_key[0])
                node = dict(node)
                node["bias"] = jax.random.uniform(
                    sub, node["bias"].shape, node["bias"].dtype, -bound, bound
                )
                return node
            return {k: _walk(v) for k, v in node.items()}
        return node

    return _walk(params)


def pad_batch(batch: Batch, batch_size: int) -> Batch:
    """Zero-pad a batch to the static batch size (TPU needs fixed shapes;
    padded rows have y==0 / yw==0 so they never contribute to the loss)."""
    n = batch["x"].shape[0]
    if n == batch_size:
        return batch
    out = {}
    for key, arr in batch.items():
        pad_width = [(0, batch_size - n)] + [(0, 0)] * (arr.ndim - 1)
        out[key] = np.pad(arr, pad_width)
    return out


class TransformerTrainingModuleBase:
    """Base class for training modules; subclass and pass via
    ``training_module_type`` to change the training procedure."""

    u2i_dist_available = [Distance.DOT, Distance.COSINE]
    epsilon_cosine_dist = 1e-8

    def __init__(
        self,
        backbone: TransformerBackboneBase,
        model_config: tp.Dict[str, tp.Any],
        dataset_schema: DatasetSchemaDict,
        item_external_ids: ExternalIds,
        item_extra_tokens: tp.Sequence[tp.Any],
        data_preparator: TransformerDataPreparatorBase,
        lr: float,
        gbce_t: float,
        loss: str,
        verbose: int = 0,
        train_loss_name: str = "train_loss",
        val_loss_name: str = "val_loss",
        adam_betas: tp.Tuple[float, float] = (0.9, 0.98),
        logits_t: float = 1,
        seed: int = 0,
        mesh_shape: tp.Optional[tp.Tuple[int, int]] = None,
        compute_dtype: str = "auto",
        negatives_on_device: bool = True,
        steps_per_dispatch: int = 8,
        fused_softmax_chunk: tp.Optional[int] = 2048,
        callbacks: tp.Optional[tp.Sequence["TrainingCallback"]] = None,
        val_recall_k: tp.Optional[int] = None,
        remat: bool = False,
        negatives_sharing: str = "positionwise",
        **kwargs: tp.Any,
    ) -> None:
        self.backbone = backbone
        # Per-epoch hooks (early stopping, best-state retention, custom
        # monitors) — the role of the reference's user-supplied Lightning
        # trainer callbacks (transformers/base.py:367-380 there).
        self.callbacks: tp.List["TrainingCallback"] = list(callbacks) if callbacks is not None else []
        # When set, each epoch with a validation loader also computes
        # val_recall@{k} over the held-out targets for callbacks to monitor.
        self.val_recall_k = val_recall_k
        # The full-catalog "softmax" loss streams the catalog in
        # `fused_softmax_chunk`-wide item chunks with a running logsumexp
        # instead of materializing the (B, L, n_items) logits tensor
        # (losses.fused_softmax_loss) — the logits are the HBM-bound part of
        # the step (measured 1.4x faster at 3.7k items; the win grows with
        # catalog size). Applies to similarity modules whose logits are a
        # plain dot of towers and catalogs larger than one chunk; None
        # disables.
        self.fused_softmax_chunk = fused_softmax_chunk
        # Draw uniform negatives inside the jit step (device PRNG) instead of
        # shipping a (B, L, n_negatives) host array every step — at production
        # shapes that array is tens of MB per step of pure H2D traffic.
        # Applies only to CatalogUniformSampler; custom samplers stay on host.
        self.negatives_on_device = negatives_on_device
        # Fuse this many optimizer steps into one dispatch (works on single
        # devices and meshes: stacked batches shard the batch axis over the
        # data axis). The per-step RNG stream is IDENTICAL either way (see
        # _train_multi_step), so this only amortizes dispatch/transfer
        # latency — with the compact wire dtypes it lifts the full
        # `model.fit` path from 21.6k to 37.9k examples/s through a
        # remote-device tunnel at the KION shape (PERF_r04.md).
        if steps_per_dispatch < 1:
            raise ValueError(f"steps_per_dispatch must be >= 1, got {steps_per_dispatch}")
        self.steps_per_dispatch = steps_per_dispatch
        # "positionwise" (reference parity): independent negatives per
        # position — a (B, L, K, D) embedding gather whose backward is a
        # scatter-add of B*L*K rows, which TPU serializes (measured 188 ms
        # fwd+bwd vs 11 ms for the FULL 15.7k-catalog dense matmul at
        # B=512, L=100, K=257). "batch": one (B, K) negative set shared by
        # all positions of each session — the negative logits become a dense
        # (B, L, K) MXU einsum and the gather shrinks by L×. Standard
        # shared-negatives sampled softmax; requires device-drawn negatives.
        if negatives_sharing not in ("positionwise", "batch"):
            raise ValueError("negatives_sharing must be 'positionwise' or 'batch'")
        if negatives_sharing == "batch" and not negatives_on_device:
            raise ValueError(
                "negatives_sharing='batch' draws its negatives on device; "
                "it requires negatives_on_device=True and the default CatalogUniformSampler"
            )
        self.negatives_sharing = negatives_sharing
        # Gradient rematerialization: the backward recomputes the tower
        # forward instead of keeping its per-block activations in HBM —
        # trades one extra forward of FLOPs for O(n_blocks * B * L * D) of
        # activation memory. This is the knob that fits large-batch /
        # long-context configs (e.g. ML-20M-scale at B=512) on one chip.
        self.remat = remat
        self.mesh_shape = tuple(mesh_shape) if mesh_shape is not None else None
        self._mesh = None
        # "bfloat16" runs the forward/backward matmuls in the MXU's native
        # precision while master weights and the loss stay float32 (the
        # mixed-precision recipe); "float32" is exact parity mode. The
        # default "auto" resolves per backend: bf16 on TPU (the documented
        # recommended config — gate-scale quality drift is pinned by
        # tests/models/nn/transformers/test_bf16_drift.py), f32 elsewhere.
        if compute_dtype not in ("auto", "float32", "bfloat16"):
            raise ValueError(f"compute_dtype must be 'auto', 'float32' or 'bfloat16', got {compute_dtype}")
        self.compute_dtype = compute_dtype
        self.model_config = model_config
        self.dataset_schema = dataset_schema
        self.item_external_ids = item_external_ids
        self.item_extra_tokens = item_extra_tokens
        self.data_preparator = data_preparator
        self.lr = lr
        self.loss = loss
        self.gbce_t = gbce_t
        self.adam_betas = adam_betas
        self.verbose = verbose
        self.train_loss_name = train_loss_name
        self.val_loss_name = val_loss_name
        self.logits_t = logits_t
        self.seed = seed

        self._requires_negatives = requires_negatives(loss)
        self.is_fitted = False
        self.params: tp.Optional[Params] = None
        self.opt_state: tp.Optional[tp.Any] = None
        self.epochs_completed = 0
        self.global_step = 0
        self.train_loss_history: tp.List[float] = []
        self.val_loss_history: tp.List[float] = []
        self.val_metric_history: tp.Dict[str, tp.List[float]] = {}

    def fit(
        self,
        train_loader_factory: tp.Callable[[np.random.Generator], BatchLoader],
        val_loader_factory: tp.Callable[[np.random.Generator], tp.Optional[BatchLoader]],
        max_epochs: int,
    ) -> None:
        raise NotImplementedError()

    def recommend_u2i(self, *args: tp.Any, **kwargs: tp.Any) -> InternalRecoTriplet:
        raise NotImplementedError()

    def recommend_i2i(self, *args: tp.Any, **kwargs: tp.Any) -> InternalRecoTriplet:
        raise NotImplementedError()


class TransformerTrainingModule(TransformerTrainingModuleBase):
    """Default training module (reference lightning.py:259-449)."""

    i2i_dist = Distance.COSINE

    # ------------------------------------------------------------------- setup

    def _make_optimizer(self) -> optax.GradientTransformation:
        b1, b2 = self.adam_betas
        tx = optax.adam(learning_rate=self.lr, b1=b1, b2=b2, eps=1e-8)
        if self._get_mesh() is None:
            # single-device: ravel the tree into one vector so the Adam
            # update runs as one fused kernel instead of one per leaf
            # (measured 1.48 -> 1.03 ms/step at the KION config,
            # benchmarks/step_decomposition.py). Under a mesh the per-leaf
            # form is kept: flattening would concatenate differently-sharded
            # leaves into one array and force a resharding gather.
            tx = optax.flatten(tx)
        return tx

    def _loss_fn(self, logits: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        if self.loss == "softmax":
            return softmax_loss(logits, y, w)
        if self.loss == "BCE":
            return bce_loss(logits, y, w)
        if self.loss == "gBCE":
            n_actual_items = self.backbone.item_model.n_items - len(self.item_extra_tokens)
            n_negatives = self.data_preparator.n_negatives
            if n_negatives is None:  # pragma: no cover
                raise ValueError("`n_negatives` is not defined. Please ensure that `n_negatives` is set.")
            return gbce_loss(logits, y, w, n_actual_items, n_negatives, self.gbce_t)
        if self.loss == "sampled_softmax":
            return sampled_softmax_loss(logits, y, w)
        return self._calc_custom_loss(logits, y, w)

    def _calc_custom_loss(self, logits: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        raise ValueError(f"loss {self.loss} is not supported")

    @property
    def _use_fused_softmax(self) -> bool:
        from .similarity import SimilarityModuleBase

        sim = self.backbone.similarity_module
        return (
            self.loss == "softmax"
            and self.fused_softmax_chunk is not None
            # single-chunk catalogs get no streaming benefit, only scan overhead
            and self.backbone.item_model.n_items > self.fused_softmax_chunk
            and type(sim).catalog_loss_towers is not SimilarityModuleBase.catalog_loss_towers
        )

    @property
    def resolved_compute_dtype(self) -> str:
        """The dtype ``compute_dtype='auto'`` resolves to on this backend:
        bf16 on TPU hardware, exact f32 anywhere else."""
        if self.compute_dtype == "auto":
            return "bfloat16" if jax.default_backend() == "tpu" else "float32"
        return self.compute_dtype

    def _fused_softmax_loss_value(
        self, params: Params, batch: tp.Dict[str, jnp.ndarray], dropout_rng: tp.Optional[jax.Array]
    ) -> jnp.ndarray:
        deterministic = dropout_rng is None
        rngs = None if deterministic else {"dropout": dropout_rng}
        if self.resolved_compute_dtype == "bfloat16":
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, params
            )

        def towers(module: tp.Any, batch: tp.Dict[str, jnp.ndarray]) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
            item_embs = module.item_model.embed_catalog(deterministic=deterministic)
            session_embs = module.encode_sessions(batch, item_embs, deterministic=deterministic)
            return module.similarity_module.catalog_loss_towers(session_embs, item_embs)

        def towers_value(p: Params, b: tp.Dict[str, jnp.ndarray], r: tp.Optional[tp.Dict[str, jax.Array]]):
            return self.backbone.apply({"params": p}, b, method=towers, rngs=r)

        if self.remat and not deterministic:
            towers_value = jax.checkpoint(towers_value)
        s_t, i_t = towers_value(params, batch, rngs)
        # Under bf16 compute the towers STAY bf16 into the lse: every matmul
        # in the streaming kernel / XLA chunk scan accumulates f32 via
        # preferred_element_type, so the dominant (B*L, N) logit product runs
        # at MXU bf16 peak while the logsumexp itself is exact f32. Only the
        # temperature scale is applied at the working precision.
        work_dtype = jnp.bfloat16 if self.resolved_compute_dtype == "bfloat16" else jnp.float32
        s_t = (s_t.astype(jnp.float32) / self.logits_t).astype(work_dtype)
        i_t = i_t.astype(work_dtype)

        mesh = self._get_mesh()
        if mesh is not None:
            # DPxTP form of the fused loss: item tower re-sharded by ROWS over
            # the model axis (an (N, D) reshard — trivial next to the step),
            # per-shard streaming lse, then an (M,)-sized logsumexp merge over
            # ICI. Session rows stay batch-sharded on the data axis.
            from ....ops.softmax_lse import sharded_streaming_lse
            from ....parallel.mesh import DATA_AXIS as _DATA, MODEL_AXIS as _MODEL

            b, length, d = s_t.shape
            lse = sharded_streaming_lse(
                s_t.reshape(b * length, d),
                i_t,
                mesh,
                _MODEL,
                data_axis=_DATA,
                interpret=jax.default_backend() != "tpu",
            ).reshape(b, length)
            from .losses import _ce_from_lse

            return _ce_from_lse(s_t, i_t, batch["y"], batch["yw"], lse)

        return fused_softmax_loss(
            s_t, i_t, batch["y"], batch["yw"], chunk=self.fused_softmax_chunk
        )

    @property
    def _use_device_negatives(self) -> bool:
        from .negative_sampler import CatalogUniformSampler

        return (
            self._requires_negatives
            and self.negatives_on_device
            and type(self.data_preparator.negative_sampler) is CatalogUniformSampler
        )

    def _draw_device_negatives(self, batch: tp.Dict[str, jnp.ndarray], neg_rng: jax.Array) -> jnp.ndarray:
        """Uniform negatives drawn on device — same [n_extra_tokens, n_items)
        range as CatalogUniformSampler (negative_sampler.py), device PRNG
        stream instead of host numpy."""
        n_negatives = self.data_preparator.n_negatives
        lowest = len(self.item_extra_tokens)
        highest = self.backbone.item_model.n_items
        b, length = batch["y"].shape
        # counter-hash uniform ints: per-element threefry for (B, L, n_neg)
        # draws was measurable step time (see models/nn/dropout.py)
        from ..dropout import hash_uniform_ints

        return hash_uniform_ints(neg_rng, (b, length, n_negatives), lowest, highest)

    def _batch_logits(
        self,
        params: Params,
        batch: tp.Dict[str, jnp.ndarray],
        dropout_rng: tp.Optional[jax.Array],
        neg_rng: tp.Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Forward pass -> logits / logits_t (reference lightning.py:301-309)."""
        deterministic = dropout_rng is None
        rngs = None if deterministic else {"dropout": dropout_rng}
        if self.resolved_compute_dtype == "bfloat16":
            # half-precision compute, f32 master weights: grads flow through
            # the cast back to the f32 tree
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, params
            )
        if self._requires_negatives and self.negatives_sharing == "batch":
            if neg_rng is None:
                raise ValueError("neg_rng required when negatives are sampled on device")
            from ..dropout import hash_uniform_ints

            n_negatives = self.data_preparator.n_negatives
            b_sz, _ = batch["y"].shape
            shared_negs = hash_uniform_ints(
                neg_rng, (b_sz, n_negatives), len(self.item_extra_tokens), self.backbone.item_model.n_items
            )

            def forward(p: Params, b: tp.Dict[str, jnp.ndarray], negs: jnp.ndarray, r: tp.Any):
                def shared_logits(module, b, negs):
                    item_embs = module.item_model.embed_catalog(deterministic=deterministic)
                    session_embs = module.encode_sessions(b, item_embs, deterministic=deterministic)
                    s_t, i_t = module.similarity_module.catalog_loss_towers(session_embs, item_embs)
                    # positives: one row gather per position (B*L rows)
                    pos_logits = jnp.einsum(
                        "bld,bld->bl", s_t, i_t[b["y"]], preferred_element_type=jnp.float32
                    )
                    # shared negatives: B*K rows gathered once, then a dense
                    # (B, L, K) MXU einsum — no B*L*K gather/scatter
                    neg_logits = jnp.einsum(
                        "bld,bkd->blk", s_t, i_t[negs], preferred_element_type=jnp.float32
                    )
                    return jnp.concatenate([pos_logits[..., None], neg_logits], axis=-1)

                return self.backbone.apply({"params": p}, b, negs, method=shared_logits, rngs=r)

            if self.remat and not deterministic:
                forward = jax.checkpoint(forward)
            logits = forward(params, batch, shared_negs, rngs)
        elif self._requires_negatives:
            y = batch["y"]
            if "negatives" in batch:
                negatives = batch["negatives"]
            else:
                if neg_rng is None:
                    raise ValueError("neg_rng required when negatives are sampled on device")
                negatives = self._draw_device_negatives(batch, neg_rng)
            pos_neg = jnp.concatenate([y[..., None], negatives], axis=-1)

            def forward(p: Params, b: tp.Dict[str, jnp.ndarray], cand: jnp.ndarray, r: tp.Any):
                return self.backbone.apply(
                    {"params": p}, b, candidate_item_ids=cand, deterministic=deterministic, rngs=r
                )

            if self.remat and not deterministic:
                forward = jax.checkpoint(forward)
            logits = forward(params, batch, pos_neg, rngs)
        else:

            def forward(p: Params, b: tp.Dict[str, jnp.ndarray], r: tp.Any):
                return self.backbone.apply({"params": p}, b, deterministic=deterministic, rngs=r)

            if self.remat and not deterministic:
                forward = jax.checkpoint(forward)
            logits = forward(params, batch, rngs)
        return logits.astype(jnp.float32) / self.logits_t

    # ------------------------------------------------------------- jitted steps

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def _train_step(
        self, params: Params, opt_state: tp.Any, batch: tp.Dict[str, jnp.ndarray], dropout_rng: jax.Array
    ) -> tp.Tuple[Params, tp.Any, jnp.ndarray]:
        dropout_rng, neg_rng = jax.random.split(dropout_rng)

        def loss_of(p: Params) -> jnp.ndarray:
            if self._use_fused_softmax:
                return self._fused_softmax_loss_value(p, batch, dropout_rng)
            logits = self._batch_logits(p, batch, dropout_rng, neg_rng=neg_rng)
            return self._loss_fn(logits, batch["y"], batch["yw"])

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = self._make_optimizer().update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def _train_multi_step(
        self,
        params: Params,
        opt_state: tp.Any,
        batches: tp.Dict[str, jnp.ndarray],  # each value stacked (k, ...)
        dropout_key: jax.Array,
        step0: jnp.ndarray,  # () int32 — global step of the first batch
    ) -> tp.Tuple[Params, tp.Any, jnp.ndarray]:
        """k optimizer steps in ONE dispatch (lax.scan over stacked batches).

        Per-step RNG is ``fold_in(dropout_key, step0 + i)`` — the exact
        stream the single-step loop uses — so ``steps_per_dispatch`` changes
        only the dispatch count, never the training trajectory. Through a
        remote-device transport the per-step dispatch round trip (~10 ms)
        otherwise rivals the step itself; fusing k steps amortizes it k-fold
        (and ships k host batches in one transfer).
        """

        def body(carry: tp.Tuple[Params, tp.Any], inp: tp.Tuple[tp.Dict[str, jnp.ndarray], jnp.ndarray]):
            params, opt_state = carry
            batch, idx = inp
            # wire-compact ids (uint16 for small vocabs) widen on device, free
            batch = {k: (v.astype(jnp.int32) if v.dtype == jnp.uint16 else v) for k, v in batch.items()}
            step_rng = jax.random.fold_in(dropout_key, step0 + idx)
            dropout_rng, neg_rng = jax.random.split(step_rng)

            def loss_of(p: Params) -> jnp.ndarray:
                if self._use_fused_softmax:
                    return self._fused_softmax_loss_value(p, batch, dropout_rng)
                logits = self._batch_logits(p, batch, dropout_rng, neg_rng=neg_rng)
                return self._loss_fn(logits, batch["y"], batch["yw"])

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = self._make_optimizer().update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        k = next(iter(batches.values())).shape[0]
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), (batches, jnp.arange(k)))
        return params, opt_state, losses

    @partial(jax.jit, static_argnums=(0,))
    def _val_step(
        self, params: Params, batch: tp.Dict[str, jnp.ndarray], neg_rng: tp.Optional[jax.Array] = None
    ) -> jnp.ndarray:
        logits = self._batch_logits(params, batch, None, neg_rng=neg_rng)[:, -1:, :]
        return self._loss_fn(logits, batch["y"], batch["yw"])

    @partial(jax.jit, static_argnums=(0, 3))
    def _val_recall_step(
        self, params: Params, batch: tp.Dict[str, jnp.ndarray], k: int
    ) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        """(hits, n_valid) for recall@k of the held-out val targets: last-
        position catalog scores, extra tokens masked, padded rows excluded."""

        def score_last(module: tp.Any, batch: tp.Dict[str, jnp.ndarray]) -> jnp.ndarray:
            item_embs = module.item_model.embed_catalog(deterministic=True)
            session_embs = module.encode_sessions(batch, item_embs, deterministic=True)
            return module.similarity_module._get_full_catalog_logits(session_embs[:, -1:, :], item_embs)

        scores = self.backbone.apply({"params": params}, batch, method=score_last)[:, 0, :]
        n_extra = len(self.item_extra_tokens)
        if n_extra:
            scores = scores.at[:, :n_extra].set(-jnp.inf)
        _, top = jax.lax.top_k(scores, min(k, scores.shape[-1]))
        target = batch["y"][:, 0]
        valid = batch["yw"][:, 0] > 0
        hits = jnp.any(top == target[:, None], axis=1) & valid
        return hits.sum(), valid.sum()

    @partial(jax.jit, static_argnums=(0,))
    def _encode_last(self, params: Params, batch: tp.Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Session-tower output of the last position for each session."""

        def encode(module: tp.Any, batch: tp.Dict[str, jnp.ndarray]) -> jnp.ndarray:
            item_embs = module.item_model.embed_catalog(deterministic=True)
            session_embs = module.encode_sessions(batch, item_embs, deterministic=True)
            return module.similarity_module.session_tower_forward(session_embs[:, -1, :])

        return self.backbone.apply({"params": params}, batch, method=encode)

    @partial(jax.jit, static_argnums=(0,))
    def _catalog_item_embs(self, params: Params) -> jnp.ndarray:
        def embed(module: tp.Any) -> jnp.ndarray:
            return module.item_model.embed_catalog(deterministic=True)

        return self.backbone.apply({"params": params}, method=embed)

    @partial(jax.jit, static_argnums=(0,))
    def _catalog_item_tower(self, params: Params) -> jnp.ndarray:
        def embed(module: tp.Any) -> jnp.ndarray:
            return module.similarity_module.item_tower_forward(module.item_model.embed_catalog(deterministic=True))

        return self.backbone.apply({"params": params}, method=embed)

    # ---------------------------------------------------------------- sharding

    def _get_mesh(self):
        if self.mesh_shape is None:
            return None
        if self._mesh is None:
            self._mesh = make_mesh(n_data=self.mesh_shape[0], n_model=self.mesh_shape[1])
        return self._mesh

    def _shard_params(self, params: Params) -> Params:
        """Place params on the mesh: item-vocabulary tables sharded over the
        model axis along the FEATURE (last) dimension — see the
        `_MODEL_SHARDED_PARAM_NAMES` note at the top of this module — and
        everything else replicated. Optimizer state created from sharded
        params inherits the same layout."""
        mesh = self._get_mesh()
        if mesh is None:
            return params

        n_model = self.mesh_shape[1]

        def place(path: tp.Tuple[tp.Any, ...], leaf: jnp.ndarray) -> jnp.ndarray:
            names = tuple(getattr(p, "key", getattr(p, "name", "")) for p in path)
            if (
                leaf.ndim >= 2
                and any(n in _MODEL_SHARDED_PARAM_NAMES for n in names)
                and leaf.shape[-1] % n_model == 0
            ):
                spec = P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
            else:
                spec = P()
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map_with_path(place, params)

    def _device_batch(self, batch: Batch) -> tp.Dict[str, jnp.ndarray]:
        """Move a host batch to device; batch axis sharded over `data`."""
        mesh = self._get_mesh()
        if mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        out = {}
        for key, arr in batch.items():
            if arr.shape[0] % self.mesh_shape[0] != 0:
                raise ValueError(
                    f"Batch size {arr.shape[0]} must be divisible by the data-axis size "
                    f"{self.mesh_shape[0]} for sharded training"
                )
            spec = P(DATA_AXIS, *([None] * (arr.ndim - 1)))
            out[key] = jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))
        return out

    # -------------------------------------------------------------------- init

    def init_params(self, sample_batch: Batch) -> None:
        """Initialize params (flax init + Xavier-normal re-init) and optimizer."""
        init_rng, xavier_rng = jax.random.split(jax.random.PRNGKey(self.seed))
        # Param shapes depend on model dims only, never the batch row count —
        # but flax init EXECUTES the forward eagerly, and for the full-catalog
        # softmax that materializes (B, L, n_items) logits un-jitted (8.4 GB
        # at B=512, L=200, N=20k: an instant OOM before training starts).
        # Init on a few rows instead.
        sample_batch = {k: v[: min(8, len(v))] for k, v in sample_batch.items()}
        device_batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        candidate = None
        if self._requires_negatives:
            if "negatives" in sample_batch:
                candidate = jnp.concatenate([device_batch["y"][..., None], device_batch["negatives"]], axis=-1)
            else:  # device-sampled negatives: shape-equivalent dummy candidates
                candidate = self._draw_device_negatives(device_batch, jax.random.PRNGKey(0))
                candidate = jnp.concatenate([device_batch["y"][..., None], candidate], axis=-1)
        variables = self.backbone.init(
            {"params": init_rng}, device_batch, candidate_item_ids=candidate, deterministic=True
        )
        params = variables["params"]
        params = _xavier_normal_reinit(params, xavier_rng)
        params = self._shard_params(params)
        self.params = params
        self.opt_state = self._make_optimizer().init(params)

    # --------------------------------------------------------------------- fit

    def fit(
        self,
        train_loader_factory: tp.Callable[[np.random.Generator], BatchLoader],
        val_loader_factory: tp.Callable[[np.random.Generator], tp.Optional[BatchLoader]],
        max_epochs: int,
    ) -> None:
        """Epoch loop. Loaders come from factories so each fit/fit_partial call
        re-derives its host rng stream from the module seed and epoch counter
        (deterministic refits)."""
        if self.negatives_sharing == "batch" and self._requires_negatives and not self._use_device_negatives:
            raise ValueError(
                "negatives_sharing='batch' requires device-drawn negatives "
                "(negatives_on_device=True with the default CatalogUniformSampler)"
            )
        if self.negatives_sharing == "batch" and self._requires_negatives:
            from .similarity import SimilarityModuleBase

            sim = self.backbone.similarity_module
            if type(sim).catalog_loss_towers is SimilarityModuleBase.catalog_loss_towers:
                raise ValueError(
                    "negatives_sharing='batch' computes its logits from "
                    "similarity_module.catalog_loss_towers, which "
                    f"{type(sim).__name__} does not override — use "
                    "negatives_sharing='positionwise' or implement catalog_loss_towers"
                )
        if (
            self._requires_negatives
            and self.negatives_sharing == "positionwise"
            and jax.default_backend() == "tpu"
        ):
            n_negs = self.data_preparator.n_negatives or 0
            batch_rows = self.data_preparator.batch_size * self.data_preparator.session_max_len
            n_items = self.backbone.item_model.n_items
            # per-position candidates are a (B*L*K, D) gather whose backward
            # scatter TPU serializes; once the candidate count dwarfs the
            # catalog, the dense full-catalog loss (or shared negatives) is
            # strictly faster — measured 15x at KION scale (PERF_r02.md)
            if n_negs and batch_rows * n_negs > 8 * n_items:
                warnings.warn(
                    "Per-position negative sampling gathers "
                    f"{batch_rows * n_negs:,} candidate embeddings per step against a "
                    f"{n_items:,}-item catalog — a TPU anti-pattern (serialized scatter in "
                    "the backward). Consider training_module_kwargs={'negatives_sharing': "
                    "'batch'} or loss='softmax' (see PERF_r02.md, 'gather inversion')."
                )
        self.data_preparator.host_negatives = not self._use_device_negatives
        host_rng = np.random.default_rng(np.random.SeedSequence(entropy=(self.seed, self.epochs_completed)))
        train_loader = train_loader_factory(host_rng)
        val_loader = val_loader_factory(host_rng)

        if self.params is None:
            first_batch = next(iter(train_loader))
            self.init_params(pad_batch(first_batch, train_loader.batch_size))

        dropout_key = jax.random.PRNGKey(self.seed + 1)
        val_neg_key = jax.random.PRNGKey(self.seed + 3)

        for callback in self.callbacks:
            callback.on_train_start(self)

        stop_requested = False
        group_size = self.steps_per_dispatch

        small_vocab = self.backbone.item_model.n_items < np.iinfo(np.uint16).max

        def _wire_cast(key: str, arr: np.ndarray) -> np.ndarray:
            """Smallest-sufficient wire dtype: item ids as uint16 for <65k
            catalogs, other ints as int32 — H2D bandwidth is a real cost on
            remote-device transports (measured 67 MB/s through the tunnel)."""
            if arr.dtype in (np.int64, np.int32) and key in ("x", "y", "negatives") and small_vocab:
                return arr.astype(np.uint16)
            if arr.dtype == np.int64:
                return arr.astype(np.int32)
            return arr

        mesh = self._get_mesh()

        def _prepare_group(group: tp.List[tp.Dict[str, np.ndarray]]) -> tp.Dict[str, jnp.ndarray]:
            stacked = {k: np.stack([_wire_cast(k, b[k]) for b in group]) for k in group[0]}
            if mesh is None:
                return {k: jnp.asarray(v) for k, v in stacked.items()}
            # (k, B, ...) stacks shard the BATCH axis over data; lax.scan
            # slices then carry P(data, ...) per step exactly like the
            # single-step path
            return {
                k: jax.device_put(
                    jnp.asarray(v), NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (v.ndim - 2))))
                )
                for k, v in stacked.items()
            }


        for _ in range(max_epochs):
            logs: tp.Dict[str, float] = {}
            epoch_losses = []

            def _dispatch_group(stacked: tp.Dict[str, jnp.ndarray], n_steps: int) -> None:
                self.params, self.opt_state, losses = self._train_multi_step(
                    self.params, self.opt_state, stacked, dropout_key, jnp.int32(self.global_step)
                )
                self.global_step += n_steps
                epoch_losses.append(losses)  # (k,) — flattened into the epoch mean below

            if group_size == 1:
                for batch in train_loader:
                    device_batch = self._device_batch(pad_batch(batch, train_loader.batch_size))
                    step_rng = jax.random.fold_in(dropout_key, self.global_step)
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state, device_batch, step_rng
                    )
                    self.global_step += 1
                    epoch_losses.append(loss)
            else:
                # NOTE: transfers stay on the main thread — a worker-thread
                # device_put deadlocks single-client transports (observed on
                # the remote tunnel); async dispatch still overlaps the host
                # stack/cast work with device execution
                pending_group: tp.List[tp.Dict[str, np.ndarray]] = []
                for batch in train_loader:
                    pending_group.append(pad_batch(batch, train_loader.batch_size))
                    if len(pending_group) == group_size:
                        _dispatch_group(_prepare_group(pending_group), group_size)
                        pending_group = []
                # Remainder (epoch batch count % group_size) goes through the
                # single-step path: a remainder-sized stack would compile a
                # second k-step scan per distinct remainder, and padding the
                # stack with zero-weight batches would not be trajectory-safe
                # (Adam moments decay on zero grads). The RNG stream is the
                # same fold_in(dropout_key, global_step) either way.
                for host_batch in pending_group:
                    device_batch = self._device_batch(host_batch)
                    step_rng = jax.random.fold_in(dropout_key, self.global_step)
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state, device_batch, step_rng
                    )
                    self.global_step += 1
                    epoch_losses.append(loss)
            if epoch_losses:
                flat_losses = jnp.concatenate([jnp.atleast_1d(loss) for loss in epoch_losses])
                self.train_loss_history.append(float(jnp.mean(flat_losses)))
                logs[self.train_loss_name] = self.train_loss_history[-1]
            if val_loader is not None:
                val_losses = []
                # hits/totals stay DEVICE handles until the epoch closes: a
                # float() per batch would sync the dispatch queue every val
                # batch (~100 ms each through a remote-device transport)
                hit_handles: tp.List[jax.Array] = []
                total_handles: tp.List[jax.Array] = []
                for vi, batch in enumerate(val_loader):
                    batch = pad_batch(batch, val_loader.batch_size)
                    device_batch = self._device_batch(batch)
                    neg_rng = (
                        jax.random.fold_in(val_neg_key, vi)
                        if self._requires_negatives and "negatives" not in batch
                        else None
                    )
                    val_losses.append(self._val_step(self.params, device_batch, neg_rng))
                    if self.val_recall_k is not None:
                        hits, total = self._val_recall_step(self.params, device_batch, self.val_recall_k)
                        hit_handles.append(hits)
                        total_handles.append(total)
                recall_hits = float(jnp.sum(jnp.stack(hit_handles))) if hit_handles else 0.0
                recall_total = float(jnp.sum(jnp.stack(total_handles))) if total_handles else 0.0
                if val_losses:
                    self.val_loss_history.append(float(jnp.mean(jnp.stack(val_losses))))
                    logs[self.val_loss_name] = self.val_loss_history[-1]
                if self.val_recall_k is not None and recall_total > 0:
                    name = f"val_recall@{self.val_recall_k}"
                    value = recall_hits / recall_total
                    self.val_metric_history.setdefault(name, []).append(value)
                    logs[name] = value
            self.epochs_completed += 1
            if self.verbose > 0:
                print(
                    f"epoch {self.epochs_completed}: "
                    + " ".join(f"{name}={value:.5f}" for name, value in logs.items())
                )
            for callback in self.callbacks:
                # evaluate every callback (no short-circuit): stateful hooks
                # like best-state keepers must see every epoch
                if callback.on_epoch_end(self, self.epochs_completed, logs):
                    stop_requested = True
            if stop_requested:
                break

        for callback in self.callbacks:
            callback.on_train_end(self)
        self.is_fitted = True

    # --------------------------------------------------------------- inference

    def _get_user_item_embeddings(self, recommend_loader: BatchLoader) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        """User (last-position) and item tower outputs, DEVICE-RESIDENT
        (reference lightning.py:378-400 materializes tensors; here the
        embeddings never leave the device — the downstream TPURanker
        consumes jax arrays directly, so a recommend call pays exactly one
        device->host fetch: the final top-k triplets. Profiled on hardware:
        each avoided fetch is a full transport round trip)."""
        pending: tp.List[tp.Tuple[int, jnp.ndarray]] = []
        for batch in recommend_loader:
            n = batch["x"].shape[0]
            batch = pad_batch(batch, recommend_loader.batch_size)
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}  # recommend stays single-device
            pending.append((n, self._encode_last(self.params, device_batch)))
        item_embs = self._catalog_item_tower(self.params)
        user_embs = jnp.concatenate([embs[:n] for n, embs in pending], axis=0)
        return user_embs, item_embs

    def recommend_u2i(
        self,
        user_ids: np.ndarray,
        recommend_loader: BatchLoader,
        sorted_item_ids_to_recommend: np.ndarray,
        k: int,
        dataset: Dataset,
        filter_viewed: bool,
    ) -> InternalRecoTriplet:
        """U2I: batch-encode sessions then rank on the TPU top-k engine
        (reference lightning.py:402-426)."""
        ui_csr_for_filter = None
        if filter_viewed:
            ui_csr_for_filter = dataset.get_user_item_matrix(include_weights=False, include_warm_items=True)[user_ids]
        user_embs, item_embs = self._get_user_item_embeddings(recommend_loader)
        return self.backbone.similarity_module.recommend_u2i(
            user_embs=user_embs,
            item_embs=item_embs,
            user_ids=np.asarray(user_ids),
            k=k,
            sorted_item_ids_to_recommend=sorted_item_ids_to_recommend,
            ui_csr_for_filter=ui_csr_for_filter,
        )

    def recommend_i2i(
        self,
        target_ids: np.ndarray,
        sorted_item_ids_to_recommend: np.ndarray,
        k: int,
    ) -> InternalRecoTriplet:
        """I2I: cosine ranking over raw item-net embeddings
        (reference lightning.py:428-449)."""
        item_embs = self._catalog_item_embs(self.params)  # stays on device
        ranker = TPURanker(
            distance=self.i2i_dist,
            subjects_factors=item_embs,
            objects_factors=item_embs,
        )
        return ranker.rank(
            subject_ids=target_ids,
            k=k,
            filter_pairs_csr=None,
            sorted_object_whitelist=sorted_item_ids_to_recommend,
        )

    # ------------------------------------------------------------- state (ckpt)

    def get_state(self) -> tp.Dict[str, tp.Any]:
        """Checkpoint payload: numpy param/optimizer trees + counters."""
        return {
            "params": jax.tree.map(np.asarray, self.params),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "epochs_completed": self.epochs_completed,
            "global_step": self.global_step,
            "train_loss_history": list(self.train_loss_history),
            "val_loss_history": list(self.val_loss_history),
            "val_metric_history": {name: list(vals) for name, vals in self.val_metric_history.items()},
            "is_fitted": self.is_fitted,
        }

    def set_state(self, state: tp.Dict[str, tp.Any], sample_batch: Batch) -> None:
        """Restore from checkpoint payload; ``sample_batch`` rebuilds the
        parameter tree structure before loading values."""
        self.init_params(sample_batch)
        loaded_params = state["params"]
        # device_put onto the reference leaf's sharding so restored state keeps
        # the mesh layout established by init_params
        self.params = jax.tree.map(
            lambda ref, val: jax.device_put(jnp.asarray(val), ref.sharding), self.params, loaded_params
        )
        self.opt_state = jax.tree.map(
            lambda ref, val: jax.device_put(jnp.asarray(val), ref.sharding), self.opt_state, state["opt_state"]
        )
        self.epochs_completed = state["epochs_completed"]
        self.global_step = state["global_step"]
        self.train_loss_history = list(state["train_loss_history"])
        self.val_loss_history = list(state["val_loss_history"])
        self.val_metric_history = {
            name: list(vals) for name, vals in state.get("val_metric_history", {}).items()
        }
        self.is_fitted = state["is_fitted"]
