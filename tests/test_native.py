"""Native host-ops tests: C++ kernels must agree with the numpy fallbacks."""

import numpy as np
import pytest
from scipy import sparse

from rectools_tpu import native
from rectools_tpu.models.nn.transformers.data_preparator import scatter_left_padded
from rectools_tpu.ops.topk import _csr_rows_to_padded_idx

requires_native = pytest.mark.skipif(native.lib() is None, reason="C++ toolchain unavailable")


@requires_native
class TestNativeHostOps:
    def test_scatter_left_padded_i64(self) -> None:
        rng = np.random.default_rng(0)
        values = rng.integers(0, 100, size=1000)
        lengths = rng.integers(0, 20, size=50)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        out_len = 8
        got = native.scatter_left_padded_native(values, starts, lengths, out_len, np.int64, 0)
        assert got is not None
        # numpy fallback for comparison
        import rectools_tpu.native as nat

        nat._LIB, nat._TRIED = None, True
        try:
            expected = scatter_left_padded(values, starts, lengths, out_len, np.int64)
        finally:
            nat._TRIED = False
        np.testing.assert_array_equal(got, expected)

    def test_scatter_left_padded_f32(self) -> None:
        rng = np.random.default_rng(1)
        values = rng.normal(size=500).astype(np.float32)
        lengths = rng.integers(1, 15, size=30)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        got = native.scatter_left_padded_native(values, starts, lengths, 6, np.float32, 0)
        assert got is not None
        assert got.shape == (30, 6)
        # spot check one row
        i = 3
        length = min(lengths[i], 6)
        np.testing.assert_allclose(
            got[i, 6 - length :], values[starts[i] + lengths[i] - length : starts[i] + lengths[i]]
        )

    def test_csr_rows_padded(self) -> None:
        rng = np.random.default_rng(2)
        mat = sparse.random(40, 60, density=0.2, format="csr", random_state=0)
        rows = rng.integers(0, 40, size=10)
        lengths = np.diff(mat.indptr)[rows]
        max_len = int(lengths.max())
        got = native.csr_rows_padded_native(mat.indices, mat.indptr, rows, max_len, -7)
        assert got is not None
        import rectools_tpu.native as nat

        nat._LIB, nat._TRIED = None, True
        try:
            expected = _csr_rows_to_padded_idx(mat, rows, fill=-7)
        finally:
            nat._TRIED = False
        np.testing.assert_array_equal(got, expected)

    def test_sasrec_collate(self) -> None:
        items = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], dtype=np.int64)
        weights = np.arange(10, dtype=np.float32) / 10
        starts = np.array([0, 4])
        lengths = np.array([4, 6])
        out = native.sasrec_train_collate_native(items, weights, starts, lengths, 4)
        assert out is not None
        x, y, yw = out
        np.testing.assert_array_equal(x[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(y[0], [0, 2, 3, 4])
        np.testing.assert_allclose(yw[0], [0, 0.1, 0.2, 0.3])
        # session 1 has 5 shifted pairs, truncated to last 4
        np.testing.assert_array_equal(x[1], [6, 7, 8, 9])
        np.testing.assert_array_equal(y[1], [7, 8, 9, 10])


class TestFallback:
    def test_disable_env(self, monkeypatch) -> None:
        import rectools_tpu.native as nat

        monkeypatch.setattr(nat, "_LIB", None)
        monkeypatch.setattr(nat, "_TRIED", True)
        assert nat.scatter_left_padded_native(np.array([1]), np.array([0]), np.array([1]), 2, np.int64) is None
        # numpy fallback still produces output
        out = scatter_left_padded(np.array([1, 2]), np.array([0]), np.array([2]), 4, np.int64)
        np.testing.assert_array_equal(out, [[0, 0, 1, 2]])
