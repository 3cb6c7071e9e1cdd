import numpy as np
import pytest
from scipy import sparse
from scipy.sparse.linalg import svds

from rectools_tpu import Columns
from rectools_tpu.models import EASEModel, PureSVDModel

from .data import DATASET
from .utils import (
    assert_default_config_and_default_model_params_are_the_same,
    assert_dumps_loads_do_not_change_model,
    assert_get_config_and_from_config_compatibility,
    assert_second_fit_refits_model,
)


class TestEASE:
    def test_weight_matches_numpy_closed_form(self):
        model = EASEModel(regularization=100.0).fit(DATASET)
        ui = DATASET.get_user_item_matrix(include_weights=True)
        gram = (ui.T @ ui).toarray().astype(np.float64) + 100.0 * np.eye(ui.shape[1])
        p = np.linalg.inv(gram)
        w = p / (-np.diag(p))[None, :]
        np.fill_diagonal(w, 0.0)
        np.testing.assert_allclose(model.weight, w, rtol=1e-3, atol=1e-5)

    def test_recommend_basic(self):
        model = EASEModel(regularization=100.0).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=True)
        assert set(reco[Columns.User]) == {10, 20}
        viewed_10 = {11, 12, 14}
        assert not set(reco[reco[Columns.User] == 10][Columns.Item]) & viewed_10

    def test_i2i_matches_weight_rows(self):
        model = EASEModel(regularization=100.0).fit(DATASET)
        reco = model.recommend_to_items([11], DATASET, k=2)
        t_int = DATASET.item_id_map.convert_to_internal([11])[0]
        row = model.weight[t_int].copy()
        row[t_int] = -np.inf
        expected_top = np.argsort(-row)[:2]
        expected_ext = DATASET.item_id_map.convert_to_external(expected_top)
        np.testing.assert_array_equal(reco[Columns.Item].to_numpy(), expected_ext)

    def test_second_fit(self):
        assert_second_fit_refits_model(EASEModel(regularization=100.0), DATASET)

    def test_dumps_loads(self):
        model = EASEModel().fit(DATASET)
        assert_dumps_loads_do_not_change_model(model, DATASET)

    def test_default_config(self):
        assert_default_config_and_default_model_params_are_the_same(EASEModel(), {})

    def test_config_roundtrip(self):
        assert_get_config_and_from_config_compatibility(EASEModel, DATASET, {"regularization": 42.0})

    def test_cold_raise(self):
        model = EASEModel().fit(DATASET)
        with pytest.raises(ValueError):
            model.recommend([999], DATASET, k=2, filter_viewed=False)


class TestPureSVD:
    def test_factors_reconstruct_like_scipy(self):
        model = PureSVDModel(factors=3).fit(DATASET)
        ui = DATASET.get_user_item_matrix(include_weights=True)
        u, s, vt = svds(ui.astype(np.float64), k=3)
        expected = (u * s) @ vt  # rank-3 reconstruction
        got = model.user_factors @ model.item_factors.T
        np.testing.assert_allclose(got, expected, atol=1e-2)

    def test_recommend(self):
        model = PureSVDModel(factors=2).fit(DATASET)
        reco = model.recommend([10, 30], DATASET, k=2, filter_viewed=True)
        assert (reco.groupby(Columns.User).size() <= 2).all()

    def test_get_vectors(self):
        model = PureSVDModel(factors=2).fit(DATASET)
        uf, itf = model.get_vectors()
        assert uf.shape == (4, 2)
        assert itf.shape == (6, 2)

    def test_i2i(self):
        model = PureSVDModel(factors=2).fit(DATASET)
        reco = model.recommend_to_items([11], DATASET, k=2)
        assert len(reco) == 2
        assert 11 not in set(reco[Columns.Item])

    def test_second_fit(self):
        assert_second_fit_refits_model(PureSVDModel(factors=2), DATASET)

    def test_default_config(self):
        assert_default_config_and_default_model_params_are_the_same(PureSVDModel(), {})

    def test_config_roundtrip(self):
        assert_get_config_and_from_config_compatibility(PureSVDModel, DATASET, {"factors": 2})

    def test_too_many_factors_raises(self):
        with pytest.raises(ValueError):
            PureSVDModel(factors=10).fit(DATASET)


class TestModelBaseContract:
    def test_not_fitted_raises(self):
        from rectools_tpu.exceptions import NotFittedError

        model = EASEModel()
        with pytest.raises(NotFittedError):
            model.recommend([10], DATASET, k=2, filter_viewed=False)

    def test_bad_k_raises(self):
        model = EASEModel().fit(DATASET)
        with pytest.raises(ValueError):
            model.recommend([10], DATASET, k=0, filter_viewed=False)

    def test_warn_on_unsupported(self):
        model = EASEModel().fit(DATASET)
        with pytest.warns(UserWarning):
            reco = model.recommend([10, 999], DATASET, k=2, filter_viewed=False, on_unsupported_targets="warn")
        assert set(reco[Columns.User]) == {10}

    def test_model_from_config_dispatch(self):
        from rectools_tpu.models import model_from_config

        model = model_from_config({"cls": "EASEModel", "regularization": 7.0})
        assert isinstance(model, EASEModel)
        assert model.regularization == 7.0

    def test_model_from_params(self):
        from rectools_tpu.models import model_from_params

        model = model_from_params({"cls": "PureSVDModel", "factors": 3})
        assert isinstance(model, PureSVDModel)
        assert model.factors == 3


class TestShardedGram:
    """mesh_shape option: Gram accumulated from row-sharded blocks (psum over
    mesh) must give the same closed-form weights/factors."""

    def test_ease_matches_single_device(self):
        m1 = EASEModel(regularization=100.0).fit(DATASET)
        m2 = EASEModel(regularization=100.0, mesh_shape=(4, 2)).fit(DATASET)
        np.testing.assert_allclose(m1.weight, m2.weight, rtol=1e-4, atol=1e-5)

    def test_pure_svd_matches_single_device(self):
        m1 = PureSVDModel(factors=2, random_state=32).fit(DATASET)
        m2 = PureSVDModel(factors=2, random_state=32, mesh_shape=(8, 1)).fit(DATASET)
        r1 = m1.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        r2 = m2.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        np.testing.assert_array_equal(r1[Columns.Item].values, r2[Columns.Item].values)
        np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, rtol=1e-3, atol=1e-5)

    def test_config_round_trip_keeps_mesh_shape(self):
        assert EASEModel.from_config(EASEModel(mesh_shape=(4, 2)).get_config()).mesh_shape == (4, 2)
        assert PureSVDModel.from_config(PureSVDModel(mesh_shape=(2, 4)).get_config()).mesh_shape == (2, 4)


class TestSolverOverride:
    """ADVICE r2: solver='exact'|'iterative' must be selectable at any size."""

    def test_ease_exact_and_iterative_agree_on_small_catalog(self):
        exact = EASEModel(regularization=100.0, solver="exact").fit(DATASET)
        iterative = EASEModel(regularization=100.0, solver="iterative").fit(DATASET)
        auto = EASEModel(regularization=100.0).fit(DATASET)
        np.testing.assert_allclose(exact.weight, auto.weight, atol=1e-6)
        np.testing.assert_allclose(iterative.weight, exact.weight, rtol=1e-3, atol=1e-4)

    def test_pure_svd_exact_and_iterative_agree(self):
        exact = PureSVDModel(factors=3, solver="exact").fit(DATASET)
        iterative = PureSVDModel(factors=3, solver="iterative").fit(DATASET)
        recon_exact = exact.user_factors @ exact.item_factors.T
        recon_iter = iterative.user_factors @ iterative.item_factors.T
        np.testing.assert_allclose(recon_iter, recon_exact, atol=1e-3)

    def test_solver_round_trips_through_config(self):
        model = EASEModel(solver="exact")
        assert EASEModel.from_config(model.get_config()).solver == "exact"
        svd = PureSVDModel(solver="iterative")
        assert PureSVDModel.from_config(svd.get_config()).solver == "iterative"

    def test_bad_solver_raises(self):
        with pytest.raises(ValueError):
            EASEModel(solver="nonsense").fit(DATASET)
