"""Transformer MATH parity: the reference's own torch backbone (imported
with a lightning import-stub, eval mode) and the rectools_tpu flax backbone
run the same weights over the same sessions; full-catalog logits must match.

This is the independent check that the flax/Pallas forward computes exactly
the reference semantics — embedding lookup, inverse positional encoding,
timeline-mask multiplications, the SASRec/PreLN block wiring, final layer
norms, and the dot-product similarity head."""

import numpy as np
import pytest

D, H, BLOCKS, L, N_ITEMS = 32, 2, 2, 12, 50


def _sessions():
    rng = np.random.default_rng(0)
    x = rng.integers(1, N_ITEMS, size=(4, L))
    x[0, :5] = 0  # left padding
    x[2, :9] = 0
    return x


def _flax_backbone(layer_family: str):
    from rectools_tpu.models.nn.item_net import IdEmbeddingsItemNet, SumOfEmbeddingsConstructor
    from rectools_tpu.models.nn.transformers.backbone import TransformerBackbone
    from rectools_tpu.models.nn.transformers.net_blocks import (
        LearnableInversePositionalEncoding,
        PreLNTransformerLayers,
    )
    from rectools_tpu.models.nn.transformers.sasrec import SASRecTransformerLayers
    from rectools_tpu.models.nn.transformers.similarity import DistanceSimilarityModule

    if layer_family == "sasrec":
        layers = SASRecTransformerLayers(n_blocks=BLOCKS, n_factors=D, n_heads=H, dropout_rate=0.0)
        causal, key_padding = True, False
    elif layer_family == "ligr":
        from rectools_tpu.models.nn.transformers.ligr import LiGRLayers

        layers = LiGRLayers(n_blocks=BLOCKS, n_factors=D, n_heads=H, dropout_rate=0.0)
        causal, key_padding = True, False
    else:
        layers = PreLNTransformerLayers(n_blocks=BLOCKS, n_factors=D, n_heads=H, dropout_rate=0.0)
        causal, key_padding = False, True
    item_net = SumOfEmbeddingsConstructor(
        n_items=N_ITEMS,
        item_net_blocks=(IdEmbeddingsItemNet(n_items=N_ITEMS, n_factors=D, dropout_rate=0.0),),
    )
    return TransformerBackbone(
        item_model=item_net,
        pos_encoding_layer=LearnableInversePositionalEncoding(
            use_pos_emb=True, session_max_len=L, n_factors=D
        ),
        transformer_layers=layers,
        similarity_module=DistanceSimilarityModule(),
        n_heads=H,
        dropout_rate=0.0,
        use_causal_attn=causal,
        use_key_padding_mask=key_padding,
    )


def _torch_backbone(layer_family: str):
    import torch

    from rectools.models.nn.item_net import IdEmbeddingsItemNet, SumOfEmbeddingsConstructor
    from rectools.models.nn.transformers.net_blocks import (
        LearnableInversePositionalEncoding,
        PreLNTransformerLayers,
    )
    from rectools.models.nn.transformers.sasrec import SASRecTransformerLayers
    from rectools.models.nn.transformers.similarity import DistanceSimilarityModule
    from rectools.models.nn.transformers.torch_backbone import TransformerTorchBackbone

    if layer_family == "sasrec":
        layers = SASRecTransformerLayers(BLOCKS, D, H, 0.0)
        causal, key_padding = True, False
    elif layer_family == "ligr":
        from rectools.models.nn.transformers.ligr import LiGRLayers

        layers = LiGRLayers(BLOCKS, D, H, 0.0)
        causal, key_padding = True, False
    else:
        layers = PreLNTransformerLayers(BLOCKS, D, H, 0.0)
        causal, key_padding = False, True
    backbone = TransformerTorchBackbone(
        H,
        0.0,
        SumOfEmbeddingsConstructor(N_ITEMS, [IdEmbeddingsItemNet(D, N_ITEMS, 0.0)]),
        LearnableInversePositionalEncoding(True, L, D),
        layers,
        DistanceSimilarityModule(),
        use_causal_attn=causal,
        use_key_padding_mask=key_padding,
    )
    backbone.eval()
    return backbone


def _flatten_flax(params, prefix=""):
    flat = {}
    for key, value in params.items():
        path = f"{prefix}/{key}" if prefix else key
        if hasattr(value, "items"):
            flat.update(_flatten_flax(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def _load_flax_into_torch(torch_backbone, flax_params, layer_family: str) -> None:
    import torch

    flat = _flatten_flax(flax_params)
    state = {}
    ids_emb = flat["item_model/item_net_blocks_0/ids_emb"].copy()
    ids_emb[0] = 0.0  # both sides zero the PAD row: flax forces it at lookup,
    # torch relies on padding_idx keeping the stored row zero
    state["item_model.item_net_blocks.0.ids_emb.weight"] = ids_emb
    state["pos_encoding_layer.pos_emb.weight"] = flat["pos_encoding_layer/pos_emb"]
    for b in range(BLOCKS):
        src = f"transformer_layers/block_{b}"
        dst = f"transformer_layers.transformer_blocks.{b}"
        mha = f"{src}/multi_head_attn"
        state[f"{dst}.multi_head_attn.in_proj_weight"] = np.concatenate(
            [flat[f"{mha}/{p}_proj/kernel"].T for p in ("q", "k", "v")], axis=0
        )
        state[f"{dst}.multi_head_attn.in_proj_bias"] = np.concatenate(
            [flat[f"{mha}/{p}_proj/bias"] for p in ("q", "k", "v")], axis=0
        )
        state[f"{dst}.multi_head_attn.out_proj.weight"] = flat[f"{mha}/out_proj/kernel"].T
        state[f"{dst}.multi_head_attn.out_proj.bias"] = flat[f"{mha}/out_proj/bias"]
        if layer_family == "sasrec":
            norms = (("q_layer_norm", "q_layer_norm"), ("ff_layer_norm", "ff_layer_norm"))
            ffs = ("feed_forward.ff_linear_1", "feed_forward.ff_linear_2")
            ff_src = ("feed_forward/ff_linear_1", "feed_forward/ff_linear_2")
        elif layer_family == "ligr":
            norms = (("layer_norm_1", "layer_norm_1"), ("layer_norm_2", "layer_norm_2"))
            # swiglu FFN (no biases) + the two gating linears
            ffs = (
                "feed_forward.ff_linear_1",
                "feed_forward.ff_linear_2",
                "feed_forward.ff_linear_3",
                "gating_linear_1",
                "gating_linear_2",
            )
            ff_src = (
                "feed_forward/ff_linear_1",
                "feed_forward/ff_linear_2",
                "feed_forward/ff_linear_3",
                "gating_linear_1",
                "gating_linear_2",
            )
        else:
            norms = (("layer_norm_1", "layer_norm_1"), ("layer_norm_2", "layer_norm_2"))
            ffs = ("feed_forward.ff_linear_1", "feed_forward.ff_linear_2")
            ff_src = ("feed_forward/ff_linear_1", "feed_forward/ff_linear_2")
        for src_norm, dst_norm in norms:
            state[f"{dst}.{dst_norm}.weight"] = flat[f"{src}/{src_norm}/scale"]
            state[f"{dst}.{dst_norm}.bias"] = flat[f"{src}/{src_norm}/bias"]
        for ff_dst, ff_s in zip(ffs, ff_src):
            state[f"{dst}.{ff_dst}.weight"] = flat[f"{src}/{ff_s}/kernel"].T
            if f"{src}/{ff_s}/bias" in flat:  # swiglu linears are bias-free
                state[f"{dst}.{ff_dst}.bias"] = flat[f"{src}/{ff_s}/bias"]
    if layer_family == "sasrec":
        state["transformer_layers.last_layernorm.weight"] = flat["transformer_layers/last_layernorm/scale"]
        state["transformer_layers.last_layernorm.bias"] = flat["transformer_layers/last_layernorm/bias"]

    tensors = {key: torch.from_numpy(np.ascontiguousarray(value)) for key, value in state.items()}
    missing, unexpected = torch_backbone.load_state_dict(tensors, strict=False)
    assert not unexpected, unexpected
    # anything not mapped must be buffers/empty — fail loudly on real params
    real_missing = [m for m in missing if "num_batches" not in m]
    assert not real_missing, real_missing


@pytest.mark.parametrize("layer_family", ["sasrec", "preln", "ligr"])
def test_full_catalog_logits_match(layer_family) -> None:
    import jax
    import jax.numpy as jnp
    import torch

    x = _sessions()
    flax_bb = _flax_backbone(layer_family)
    params = flax_bb.init(jax.random.PRNGKey(3), {"x": jnp.asarray(x)}, deterministic=True)["params"]
    flax_logits = np.asarray(
        flax_bb.apply({"params": params}, {"x": jnp.asarray(x)}, deterministic=True)
    )

    torch_bb = _torch_backbone(layer_family)
    _load_flax_into_torch(torch_bb, params, layer_family)
    with torch.no_grad():
        torch_logits = torch_bb({"x": torch.from_numpy(x)}).numpy()

    assert flax_logits.shape == torch_logits.shape == (4, L, N_ITEMS)
    # Parity holds at every NON-PADDED query position — the only positions
    # that ever contribute to a loss (yw=0 at pads) or serve (last position,
    # never padded under left padding). At padded queries this framework
    # deliberately diverges: the key-padding bias force-enables the diagonal
    # so batch-padding dummy rows (all-pad) stay numerically clean on static
    # TPU shapes, while torch lets padded queries attend the valid keys.
    valid_query = x != 0
    np.testing.assert_allclose(
        flax_logits[valid_query], torch_logits[valid_query], atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("layer_family", ["sasrec"])
def test_candidate_logits_match(layer_family) -> None:
    import jax
    import jax.numpy as jnp
    import torch

    x = _sessions()
    rng = np.random.default_rng(1)
    candidates = rng.integers(1, N_ITEMS, size=(4, L, 3))

    flax_bb = _flax_backbone(layer_family)
    params = flax_bb.init(jax.random.PRNGKey(3), {"x": jnp.asarray(x)}, deterministic=True)["params"]
    flax_logits = np.asarray(
        flax_bb.apply(
            {"params": params},
            {"x": jnp.asarray(x)},
            candidate_item_ids=jnp.asarray(candidates),
            deterministic=True,
        )
    )

    torch_bb = _torch_backbone(layer_family)
    _load_flax_into_torch(torch_bb, params, layer_family)
    with torch.no_grad():
        torch_logits = torch_bb(
            {"x": torch.from_numpy(x)}, candidate_item_ids=torch.from_numpy(candidates)
        ).numpy()
    np.testing.assert_allclose(flax_logits, torch_logits, atol=2e-4, rtol=2e-4)


def test_hstu_stu_layers_match() -> None:
    """HSTU's STU attention (SiLU-normalized, in-kernel relative time and
    position biases) against the reference torch implementation — full
    backbone, identical weights and timestamps."""
    import jax
    import jax.numpy as jnp
    import torch

    from rectools_tpu.models.nn.item_net import IdEmbeddingsItemNet, SumOfEmbeddingsConstructor
    from rectools_tpu.models.nn.transformers.backbone import TransformerBackbone
    from rectools_tpu.models.nn.transformers.hstu import STULayers
    from rectools_tpu.models.nn.transformers.net_blocks import LearnableInversePositionalEncoding
    from rectools_tpu.models.nn.transformers.similarity import DistanceSimilarityModule

    x = _sessions()
    rng = np.random.default_rng(2)
    base_ts = 1_700_000_000
    unix_ts = np.sort(rng.integers(0, 86400 * 20, size=(4, L + 1)), axis=1) + base_ts

    flax_bb = TransformerBackbone(
        item_model=SumOfEmbeddingsConstructor(
            n_items=N_ITEMS,
            item_net_blocks=(IdEmbeddingsItemNet(n_items=N_ITEMS, n_factors=D, dropout_rate=0.0),),
        ),
        pos_encoding_layer=LearnableInversePositionalEncoding(
            use_pos_emb=False, session_max_len=L, n_factors=D
        ),
        transformer_layers=STULayers(
            n_blocks=BLOCKS, n_factors=D, n_heads=H, linear_hidden_dim=16, attention_dim=16,
            session_max_len=L, relative_time_attention=True, relative_pos_attention=True,
            dropout_rate=0.0,
        ),
        similarity_module=DistanceSimilarityModule(),
        n_heads=H,
        dropout_rate=0.0,
        use_causal_attn=True,
    )
    batch = {"x": jnp.asarray(x), "unix_ts": jnp.asarray(unix_ts)}
    params = flax_bb.init(jax.random.PRNGKey(5), batch, deterministic=True)["params"]
    flax_logits = np.asarray(flax_bb.apply({"params": params}, batch, deterministic=True))

    from rectools.models.nn.item_net import (
        IdEmbeddingsItemNet as RefIdNet,
        SumOfEmbeddingsConstructor as RefSumCtor,
    )
    from rectools.models.nn.transformers.hstu import STULayers as RefSTULayers
    from rectools.models.nn.transformers.net_blocks import (
        LearnableInversePositionalEncoding as RefPos,
    )
    from rectools.models.nn.transformers.similarity import DistanceSimilarityModule as RefSim
    from rectools.models.nn.transformers.torch_backbone import TransformerTorchBackbone

    torch_bb = TransformerTorchBackbone(
        H,
        0.0,
        RefSumCtor(N_ITEMS, [RefIdNet(D, N_ITEMS, 0.0)]),
        RefPos(False, L, D),
        RefSTULayers(
            n_blocks=BLOCKS, n_factors=D, n_heads=H, linear_hidden_dim=16, attention_dim=16,
            session_max_len=L, relative_time_attention=True, relative_pos_attention=True,
            dropout_rate=0.0,
        ),
        RefSim(),
        use_causal_attn=True,
    )
    torch_bb.eval()

    flat = _flatten_flax(params)
    state = {}
    ids_emb = flat["item_model/item_net_blocks_0/ids_emb"].copy()
    ids_emb[0] = 0.0
    state["item_model.item_net_blocks.0.ids_emb.weight"] = ids_emb
    for b in range(BLOCKS):
        src = f"transformer_layers/block_{b}"
        dst = f"transformer_layers.stu_blocks.{b}"
        state[f"{dst}.uvqk_proj"] = flat[f"{src}/uvqk_proj"]
        state[f"{dst}.rel_attn.time_weights"] = flat[f"{src}/rel_attn/time_weights"]
        state[f"{dst}.rel_attn.pos_weights"] = flat[f"{src}/rel_attn/pos_weights"]
        state[f"{dst}.output_mlp.weight"] = flat[f"{src}/output_mlp/kernel"].T
        state[f"{dst}.output_mlp.bias"] = flat[f"{src}/output_mlp/bias"]
        for norm in ("norm_input", "norm_attn_output"):
            state[f"{dst}.{norm}.weight"] = flat[f"{src}/{norm}/scale"]
            state[f"{dst}.{norm}.bias"] = flat[f"{src}/{norm}/bias"]
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    missing, unexpected = torch_bb.load_state_dict(tensors, strict=False)
    assert not unexpected, unexpected
    assert not [m for m in missing if "num_batches" not in m], missing

    with torch.no_grad():
        torch_logits = torch_bb(
            {"x": torch.from_numpy(x), "unix_ts": torch.from_numpy(unix_ts)}
        ).numpy()

    valid_query = x != 0
    np.testing.assert_allclose(
        flax_logits[valid_query], torch_logits[valid_query], atol=3e-4, rtol=3e-4
    )
