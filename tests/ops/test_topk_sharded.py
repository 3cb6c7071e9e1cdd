"""Mesh-sharded top-k MIPS: exact parity with the single-device engine.

Runs on the virtual 8-device CPU mesh from conftest (the reference has no
distributed serving path at all — SURVEY.md §2.9)."""

import numpy as np
import pytest
from scipy import sparse

from rectools_tpu.models.rank import TPURanker
from rectools_tpu.ops.topk import Distance, rank_topk
from rectools_tpu.ops.topk_sharded import ShardedTopKEngine, rank_topk_sharded
from rectools_tpu.parallel.mesh import MODEL_AXIS, make_mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, d, b = 1000, 32, 37
    objects = rng.normal(size=(n, d)).astype(np.float32)
    subjects = rng.normal(size=(b, d)).astype(np.float32)
    seen = sparse.csr_matrix(
        (np.ones(200), (rng.integers(0, b, 200), rng.integers(0, n, 200))), shape=(b, n)
    )
    return objects, subjects, np.arange(b), seen


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=2, n_model=4)


class TestShardedTopK:
    @pytest.mark.parametrize("distance", [Distance.DOT, Distance.COSINE, Distance.EUCLIDEAN])
    def test_matches_single_device(self, data, mesh, distance) -> None:
        objects, subjects, ids, seen = data
        ref = rank_topk(subjects, objects, ids, k=10, distance=distance, filter_pairs_csr=seen)
        got = rank_topk_sharded(
            subjects, objects, ids, k=10, mesh=mesh, distance=distance, filter_pairs_csr=seen
        )
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])
        np.testing.assert_allclose(ref[2], got[2], rtol=1e-5, atol=1e-5)

    def test_whitelist(self, data, mesh) -> None:
        objects, subjects, ids, seen = data
        rng = np.random.default_rng(1)
        wl = np.sort(rng.choice(len(objects), 300, replace=False))
        ref = rank_topk(subjects, objects, ids, k=10, sorted_object_whitelist=wl, filter_pairs_csr=seen)
        got = rank_topk_sharded(
            subjects, objects, ids, k=10, mesh=mesh, sorted_object_whitelist=wl, filter_pairs_csr=seen
        )
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])
        np.testing.assert_allclose(ref[2], got[2], rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("distance", [Distance.DOT, Distance.COSINE])
    def test_device_resident_factors_match_host(self, data, mesh, distance) -> None:
        """jax-array subjects/objects (the multichip transformer serving path)
        must rank identically to the numpy path — including degenerate
        zero-norm rows under COSINE."""
        import jax.numpy as jnp

        objects, subjects, ids, seen = data
        objects = objects.copy()
        objects[7] = 0.0  # zero-norm row: host and device normalization must agree
        ref = rank_topk_sharded(subjects, objects, ids, k=10, mesh=mesh, distance=distance, filter_pairs_csr=seen)
        got = rank_topk_sharded(
            jnp.asarray(subjects), jnp.asarray(objects), ids, k=10, mesh=mesh,
            distance=distance, filter_pairs_csr=seen,
        )
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])
        np.testing.assert_allclose(ref[2], got[2], rtol=1e-5, atol=1e-5)

    def test_pure_model_axis_mesh(self, data) -> None:
        objects, subjects, ids, seen = data
        mesh = make_mesh(n_data=1, n_model=8)
        ref = rank_topk(subjects, objects, ids, k=10, filter_pairs_csr=seen)
        got = rank_topk_sharded(subjects, objects, ids, k=10, mesh=mesh, filter_pairs_csr=seen)
        np.testing.assert_array_equal(ref[1], got[1])

    def test_object_table_is_sharded(self, data, mesh) -> None:
        objects, *_ = data
        engine = ShardedTopKEngine(objects, mesh=mesh)
        spec = engine._objects_t.sharding.spec
        assert spec[1] == MODEL_AXIS
        # each chip holds 1/n_model of the padded catalog
        shard_cols = {s.data.shape[1] for s in engine._objects_t.addressable_shards}
        assert shard_cols == {engine._n_pad // mesh.shape[MODEL_AXIS]}

    def test_k_larger_than_catalog(self, mesh) -> None:
        rng = np.random.default_rng(2)
        objects = rng.normal(size=(20, 8)).astype(np.float32)
        subjects = rng.normal(size=(3, 8)).astype(np.float32)
        ref = rank_topk(subjects, objects, np.arange(3), k=50)
        got = rank_topk_sharded(subjects, objects, np.arange(3), k=50, mesh=mesh)
        np.testing.assert_array_equal(ref[1], got[1])

    def test_ranker_mesh_option(self, data, mesh) -> None:
        objects, subjects, ids, seen = data
        single = TPURanker(Distance.DOT, subjects, objects)
        sharded = TPURanker(Distance.DOT, subjects, objects, mesh=mesh)
        r1 = single.rank(ids, k=7, filter_pairs_csr=seen)
        r2 = sharded.rank(ids, k=7, filter_pairs_csr=seen)
        np.testing.assert_array_equal(r1[0], r2[0])
        np.testing.assert_array_equal(r1[1], r2[1])
        np.testing.assert_allclose(r1[2], r2[2], rtol=1e-5, atol=1e-5)
