import numpy as np
import pytest
from scipy import sparse

from rectools_tpu import Columns
from rectools_tpu.models import BPRModel, ItemKNNModel
from rectools_tpu.models.item_knn import apply_weighting

from .data import DATASET
from .utils import (
    assert_default_config_and_default_model_params_are_the_same,
    assert_dumps_loads_do_not_change_model,
    assert_get_config_and_from_config_compatibility,
    assert_second_fit_refits_model,
)


class TestBPR:
    def test_fit_recommend(self):
        model = BPRModel(factors=4, iterations=20, random_state=32, batch_size=8).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=2, filter_viewed=True)
        assert set(reco[Columns.User]) == {10, 20}
        assert (reco.groupby(Columns.User).size() == 2).all()

    def test_learning_separates_pos_from_neg(self):
        """After training, observed items should outscore unobserved on average."""
        model = BPRModel(factors=8, iterations=150, learning_rate=0.05, random_state=32, batch_size=13).fit(
            DATASET
        )
        ui = DATASET.get_user_item_matrix(include_weights=False).toarray()
        users, items = model.get_vectors()
        scores = users @ items.T
        pos_mean = scores[ui > 0].mean()
        neg_mean = scores[ui == 0].mean()
        assert pos_mean > neg_mean

    def test_determinism(self):
        m1 = BPRModel(factors=4, iterations=5, random_state=7, batch_size=8).fit(DATASET)
        m2 = BPRModel(factors=4, iterations=5, random_state=7, batch_size=8).fit(DATASET)
        np.testing.assert_allclose(m1.user_embeddings, m2.user_embeddings, atol=1e-6)

    def test_second_fit(self):
        assert_second_fit_refits_model(BPRModel(factors=4, iterations=3, random_state=32, batch_size=8), DATASET)

    def test_dumps_loads(self):
        model = BPRModel(factors=4, iterations=2, random_state=32, batch_size=8).fit(DATASET)
        assert_dumps_loads_do_not_change_model(model, DATASET)

    def test_default_config(self):
        assert_default_config_and_default_model_params_are_the_same(BPRModel(), {})

    def test_config_roundtrip(self):
        assert_get_config_and_from_config_compatibility(
            BPRModel, DATASET, {"factors": 4, "iterations": 2, "random_state": 32, "batch_size": 8}
        )

    def test_get_vectors_bias_columns(self):
        model = BPRModel(factors=4, iterations=2, random_state=32, batch_size=8).fit(DATASET)
        users, items = model.get_vectors()
        assert users.shape[1] == 5
        np.testing.assert_array_equal(users[:, 0], np.ones(4))


class TestKNNWeighting:
    @pytest.fixture
    def csr(self):
        rng = np.random.default_rng(0)
        dense = (rng.random((6, 5)) < 0.5) * rng.integers(1, 5, (6, 5))
        return sparse.csr_matrix(dense.astype(np.float64))

    def test_plain_is_identity(self, csr):
        w = apply_weighting(csr, "plain")
        np.testing.assert_array_equal(w.toarray(), csr.toarray())

    def test_cosine_gram_is_cosine(self, csr):
        w = apply_weighting(csr, "cosine")
        s = (w.T @ w).toarray()
        x = csr.toarray()
        norms = np.linalg.norm(x, axis=0)
        norms[norms == 0] = 1
        expected = (x / norms).T @ (x / norms)
        np.testing.assert_allclose(s, expected, atol=1e-10)

    def test_tfidf_shapes(self, csr):
        w = apply_weighting(csr, "tfidf")
        assert w.shape == csr.shape
        assert w.nnz == csr.nnz

    def test_bm25_positive(self, csr):
        w = apply_weighting(csr, "bm25")
        assert (w.data > 0).all()


class TestItemKNN:
    @pytest.mark.parametrize("variant", ["plain", "cosine", "tfidf", "bm25"])
    def test_fit_recommend(self, variant):
        model = ItemKNNModel(K=3, variant=variant).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=2, filter_viewed=True)
        assert set(reco[Columns.User]) <= {10, 20}

    def test_similarity_topk_truncated(self):
        model = ItemKNNModel(K=2, variant="cosine").fit(DATASET)
        nnz_per_row = (model.similarity != 0).sum(axis=1)
        assert (nnz_per_row <= 2).all()

    def test_i2i(self):
        model = ItemKNNModel(K=5, variant="cosine").fit(DATASET)
        reco = model.recommend_to_items([11], DATASET, k=2)
        assert 11 not in set(reco[Columns.Item])
        assert len(reco) <= 2

    def test_second_fit(self):
        assert_second_fit_refits_model(ItemKNNModel(K=3, variant="cosine"), DATASET)

    def test_config_roundtrip(self):
        assert_get_config_and_from_config_compatibility(ItemKNNModel, DATASET, {"K": 3, "variant": "bm25"})

    def test_default_config(self):
        assert_default_config_and_default_model_params_are_the_same(ItemKNNModel(), {})
