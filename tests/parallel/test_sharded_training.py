"""Multi-device sharded training tests on the virtual 8-device CPU mesh —
the deterministic "fake backend" coverage the reference never had
(SURVEY.md §4)."""

import jax
import numpy as np
import pandas as pd
import pytest
from jax.sharding import PartitionSpec as P

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import SASRecModel
from rectools_tpu.parallel.mesh import MODEL_AXIS, make_mesh


def _dataset() -> Dataset:
    rng = np.random.default_rng(0)
    rows = []
    for u in range(40):
        n = rng.integers(3, 10)
        for t, i in enumerate(rng.integers(0, 30, size=n)):
            rows.append((u, int(i), 1.0, pd.Timestamp("2021-01-01") + pd.Timedelta(days=int(t))))
    return Dataset.construct(pd.DataFrame(rows, columns=Columns.Interactions))


requires_8_devices = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@requires_8_devices
class TestShardedTraining:
    def test_mesh_construction(self) -> None:
        mesh = make_mesh(n_data=4, n_model=2)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_dp_tp_training_runs_and_shards(self) -> None:
        dataset = _dataset()
        model = SASRecModel(
            n_blocks=1,
            n_heads=2,
            n_factors=16,
            session_max_len=8,
            epochs=2,
            batch_size=16,
            seed=3,
            dropout_rate=0.0,
            training_module_kwargs={"mesh_shape": (4, 2)},
        )
        model.fit(dataset)
        assert all(np.isfinite(loss) for loss in model.training_module.train_loss_history)
        # item embedding table sharded over the feature dim on the model axis
        emb = model.training_module.params["item_model"]["item_net_blocks_0"]["ids_emb"]
        assert emb.sharding.spec == P(None, MODEL_AXIS)
        reco = model.recommend(np.arange(10), dataset, k=5, filter_viewed=True)
        assert reco[Columns.User].nunique() == 10

    def test_sharded_matches_single_device(self) -> None:
        dataset = _dataset()
        common = dict(
            n_blocks=1, n_heads=2, n_factors=16, session_max_len=8, epochs=1,
            batch_size=16, seed=3, dropout_rate=0.0,
        )
        single = SASRecModel(**common)
        single.fit(dataset)
        sharded = SASRecModel(training_module_kwargs={"mesh_shape": (4, 2)}, **common)
        sharded.fit(dataset)
        # identical math up to reduction-order float noise
        np.testing.assert_allclose(
            single.training_module.train_loss_history,
            sharded.training_module.train_loss_history,
            rtol=1e-4,
        )
        reco_s = single.recommend([0, 1, 2], dataset, k=5, filter_viewed=False)
        reco_m = sharded.recommend([0, 1, 2], dataset, k=5, filter_viewed=False)
        np.testing.assert_allclose(
            reco_s[Columns.Score].values, reco_m[Columns.Score].values, atol=1e-3
        )

    def test_grouped_dispatch_on_mesh_preserves_trajectory(self) -> None:
        """steps_per_dispatch must be a pure dispatch-granularity knob on a
        mesh too: identical RNG stream, bit-identical loss history."""
        dataset = _dataset()
        common = dict(
            n_blocks=1, n_heads=2, n_factors=16, session_max_len=8, epochs=2,
            batch_size=16, seed=3, dropout_rate=0.0,
        )

        def fit(k: int) -> list:
            model = SASRecModel(
                training_module_kwargs={"mesh_shape": (4, 2), "steps_per_dispatch": k}, **common
            )
            model.fit(dataset)
            return model.training_module.train_loss_history

        assert fit(1) == fit(4)

    def test_indivisible_batch_raises(self) -> None:
        dataset = _dataset()
        model = SASRecModel(
            n_blocks=1, n_heads=2, n_factors=16, session_max_len=8, epochs=1,
            batch_size=10, seed=3, training_module_kwargs={"mesh_shape": (4, 2)},
        )
        with pytest.raises(ValueError, match="divisible"):
            model.fit(dataset)

    def test_sharded_save_load(self) -> None:
        dataset = _dataset()
        model = SASRecModel(
            n_blocks=1, n_heads=2, n_factors=16, session_max_len=8, epochs=1,
            batch_size=16, seed=3, dropout_rate=0.0,
            training_module_kwargs={"mesh_shape": (4, 2)},
        )
        model.fit(dataset)
        restored = SASRecModel.loads(model.dumps())
        r1 = model.recommend([0, 1], dataset, k=3, filter_viewed=False)
        r2 = restored.recommend([0, 1], dataset, k=3, filter_viewed=False)
        np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, atol=1e-4)


def test_sharded_training_with_fused_softmax() -> None:
    """DP x TP mesh + the chunked logsumexp loss: XLA inserts the collectives
    through the streamed-chunk einsums; results match single-device fused."""
    import pandas as pd

    from rectools_tpu import Columns
    from rectools_tpu.dataset import Dataset
    from rectools_tpu.models import SASRecModel

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            Columns.User: rng.integers(0, 40, 600),
            Columns.Item: rng.integers(0, 30, 600),
            Columns.Weight: 1.0,
            Columns.Datetime: pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 60, 600), unit="D"),
        }
    )
    ds = Dataset.construct(df)
    tiny = dict(
        n_blocks=1, n_heads=2, n_factors=8, session_max_len=6, epochs=1, batch_size=8, seed=32, dropout_rate=0.0
    )
    sharded = SASRecModel(
        loss="softmax", training_module_kwargs={"mesh_shape": (4, 2), "fused_softmax_chunk": 8}, **tiny
    ).fit(ds)
    assert sharded.training_module._use_fused_softmax
    single = SASRecModel(
        loss="softmax", training_module_kwargs={"fused_softmax_chunk": 8}, **tiny
    ).fit(ds)
    users = ds.user_id_map.external_ids[:10]
    r1 = sharded.recommend(users, ds, k=5, filter_viewed=False)
    r2 = single.recommend(users, ds, k=5, filter_viewed=False)
    np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, rtol=1e-3, atol=1e-4)


@requires_8_devices
class TestShardedFusedSoftmax:
    def test_sharded_lse_loss_matches_single_device(self) -> None:
        """Force the fused-softmax gate on (tiny chunk) so mesh training runs
        the row-sharded streaming-lse path; losses must match the unsharded
        fused path."""
        dataset = _dataset()
        common = dict(
            n_blocks=1, n_heads=2, n_factors=16, session_max_len=8, epochs=2, batch_size=16,
            seed=3, dropout_rate=0.0, loss="softmax",
        )
        sharded = SASRecModel(
            training_module_kwargs={"mesh_shape": (4, 2), "fused_softmax_chunk": 8}, **common
        )
        sharded.fit(dataset)
        single = SASRecModel(training_module_kwargs={"fused_softmax_chunk": 8}, **common)
        single.fit(dataset)
        assert sharded.training_module._use_fused_softmax
        np.testing.assert_allclose(
            np.asarray(sharded.training_module.train_loss_history),
            np.asarray(single.training_module.train_loss_history),
            rtol=1e-3,
        )
