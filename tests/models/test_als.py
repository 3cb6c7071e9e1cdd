import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import ALSModel
from rectools_tpu.ops.als import als_half_step

from .data import DATASET, INTERACTIONS
from .utils import (
    assert_default_config_and_default_model_params_are_the_same,
    assert_dumps_loads_do_not_change_model,
    assert_get_config_and_from_config_compatibility,
    assert_second_fit_refits_model,
)


def numpy_half_step(xy_csr, y, reg):
    """Reference per-row LS: A = YtY + reg I + sum (|c|-1) yy^T, b = sum max(c,0) y."""
    n_subjects = xy_csr.shape[0]
    f = y.shape[1]
    yty = y.T @ y + reg * np.eye(f)
    out = np.zeros((n_subjects, f))
    for u in range(n_subjects):
        sl = slice(xy_csr.indptr[u], xy_csr.indptr[u + 1])
        idx = xy_csr.indices[sl]
        c = xy_csr.data[sl]
        if len(idx) == 0:
            continue
        yb = y[idx]
        a = yty + (yb * (np.abs(c) - 1)[:, None]).T @ yb
        b = (yb * np.maximum(c, 0)[:, None]).sum(axis=0)
        out[u] = np.linalg.solve(a, b)
    return out


class TestALSSolver:
    def test_half_step_matches_numpy(self):
        rng = np.random.default_rng(0)
        n_u, n_i, f = 30, 20, 8
        dense = rng.random((n_u, n_i)) * (rng.random((n_u, n_i)) < 0.3) * 5
        csr = sparse.csr_matrix(dense.astype(np.float32))
        y = rng.normal(size=(n_i, f)).astype(np.float32)
        got = als_half_step(csr, y, regularization=0.5)
        expected = numpy_half_step(csr, y.astype(np.float64), 0.5)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_empty_rows_get_zeros(self):
        csr = sparse.csr_matrix((5, 4), dtype=np.float32)
        y = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
        got = als_half_step(csr, y, regularization=0.1)
        np.testing.assert_array_equal(got, np.zeros((5, 3)))


class TestALSModel:
    def test_fit_recommend(self):
        model = ALSModel(factors=4, iterations=5, random_state=32).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=2, filter_viewed=True)
        assert set(reco[Columns.User]) == {10, 20}
        assert 11 not in set(reco[reco[Columns.User] == 10][Columns.Item])

    def test_training_reduces_loss(self):
        ui = DATASET.get_user_item_matrix(include_weights=True).toarray()
        m1 = ALSModel(factors=4, iterations=1, random_state=32).fit(DATASET)
        m10 = ALSModel(factors=4, iterations=10, random_state=32).fit(DATASET)

        def loss(m):
            pred = m.user_factors @ m.item_factors.T
            conf = ui
            return float((conf * (1 - pred) ** 2 + (pred**2) * (conf == 0)).sum())

        assert loss(m10) < loss(m1)

    def test_second_fit(self):
        assert_second_fit_refits_model(ALSModel(factors=4, iterations=3, random_state=32), DATASET)

    def test_fit_partial_continues(self):
        m_full = ALSModel(factors=4, iterations=6, random_state=32).fit(DATASET)
        m_part = ALSModel(factors=4, iterations=3, random_state=32).fit(DATASET)
        m_part.fit_partial(DATASET, epochs=3)
        np.testing.assert_allclose(m_part.user_factors, m_full.user_factors, rtol=1e-3, atol=1e-5)

    def test_dumps_loads(self):
        model = ALSModel(factors=4, iterations=2, random_state=32).fit(DATASET)
        assert_dumps_loads_do_not_change_model(model, DATASET)

    def test_default_config(self):
        assert_default_config_and_default_model_params_are_the_same(ALSModel(), {})

    def test_config_roundtrip(self):
        assert_get_config_and_from_config_compatibility(
            ALSModel, DATASET, {"factors": 4, "iterations": 2, "random_state": 32}
        )


@pytest.fixture
def featured_dataset():
    user_features = pd.DataFrame(
        {
            "id": [10, 20, 30, 40],
            "feature": ["age"] * 4,
            "value": [1.0, 2.0, 1.0, 3.0],
        }
    )
    item_features = pd.DataFrame(
        {
            "id": [11, 12, 13, 14, 15, 17],
            "feature": ["genre"] * 6,
            "value": ["a", "b", "a", "b", "a", "b"],
        }
    )
    return Dataset.construct(
        INTERACTIONS,
        user_features_df=user_features,
        item_features_df=item_features,
        cat_item_features=["genre"],
    )


class TestALSWithFeatures:
    def test_together_shapes(self, featured_dataset):
        model = ALSModel(factors=4, iterations=3, random_state=32, fit_features_together=True)
        model.fit(featured_dataset)
        # cols: 1 user feature + 4 latent + 2 item features = 7
        assert model.user_factors.shape == (4, 7)
        assert model.item_factors.shape == (6, 7)
        # explicit user block reset to raw features
        np.testing.assert_array_equal(model.user_factors[:, 0], [1.0, 2.0, 1.0, 3.0])
        # item explicit block = one-hot genre
        assert set(np.unique(model.item_factors[:, -2:])) <= {0.0, 1.0}

    def test_separate_shapes(self, featured_dataset):
        model = ALSModel(factors=4, iterations=3, random_state=32, fit_features_together=False)
        model.fit(featured_dataset)
        assert model.user_factors.shape == (4, 7)
        assert model.item_factors.shape == (6, 7)
        # user chunk order: latent | user features | paired
        np.testing.assert_array_equal(model.user_factors[:, 4], [1.0, 2.0, 1.0, 3.0])

    def test_features_recommend(self, featured_dataset):
        model = ALSModel(factors=4, iterations=3, random_state=32, fit_features_together=True)
        model.fit(featured_dataset)
        reco = model.recommend([10, 20], featured_dataset, k=2, filter_viewed=False)
        assert len(reco) == 4

    def test_second_fit_with_features(self, featured_dataset):
        model = ALSModel(factors=4, iterations=2, random_state=32, fit_features_together=True)
        assert_second_fit_refits_model(model, featured_dataset)


class TestShardedALS:
    """mesh_shape option: Gram via psum over row shards + data-parallel solves
    must match single-device results exactly (per-subject systems are
    independent)."""

    def test_half_step_matches_single_device(self):
        from rectools_tpu.ops.als import als_half_step as hs
        from rectools_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(0)
        csr = sparse.random(53, 40, density=0.2, random_state=0, format="csr", dtype=np.float32)
        csr.data = 1.0 + csr.data * 10
        y = rng.normal(size=(40, 16)).astype(np.float32)
        mesh = make_mesh(n_data=4, n_model=2)
        ref = hs(csr, y, 0.05)
        got = hs(csr, y, 0.05, mesh=mesh)
        np.testing.assert_allclose(ref, got, rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
    def test_model_matches_single_device(self, mesh_shape):
        m1 = ALSModel(factors=4, iterations=3, random_state=32).fit(DATASET)
        m2 = ALSModel(factors=4, iterations=3, random_state=32, mesh_shape=mesh_shape).fit(DATASET)
        r1 = m1.recommend([10, 20, 30], DATASET, k=3, filter_viewed=False)
        r2 = m2.recommend([10, 20, 30], DATASET, k=3, filter_viewed=False)
        np.testing.assert_array_equal(r1[Columns.Item].values, r2[Columns.Item].values)
        np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, rtol=1e-3, atol=1e-5)

    def test_features_together_matches(self, featured_dataset):
        m1 = ALSModel(factors=4, iterations=2, random_state=32, fit_features_together=True)
        m2 = ALSModel(
            factors=4, iterations=2, random_state=32, fit_features_together=True, mesh_shape=(4, 2)
        )
        m1.fit(featured_dataset)
        m2.fit(featured_dataset)
        np.testing.assert_allclose(m1.item_factors, m2.item_factors, rtol=1e-3, atol=1e-5)

    def test_config_round_trip_keeps_mesh_shape(self):
        model = ALSModel(factors=4, mesh_shape=(4, 2))
        restored = ALSModel.from_config(model.get_config())
        assert restored.mesh_shape == (4, 2)
