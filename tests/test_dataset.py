"""Dataset containers: round-trips, padding, docids, sparse→dense
(reference test analog: src/data_format/dataset.rs:429-503)."""

import numpy as np
import pytest

from scann_tpu import DenseDataset, DocIdCollection, ScannError, SparseDataset
from scann_tpu.data.dataset import Datapoint


def test_from_vecs_round_trip():
    ds = DenseDataset.from_vecs([[1, 2], [3, 4], [5, 6]])
    assert ds.size == 3 and ds.dimensionality == 2
    np.testing.assert_array_equal(ds.get(1), [3, 4])


def test_from_flat():
    ds = DenseDataset.from_flat([1, 2, 3, 4, 5, 6], 3)
    assert ds.size == 2 and ds.dimensionality == 3
    with pytest.raises(ScannError):
        DenseDataset.from_flat([1, 2, 3], 2)


def test_device_padding():
    ds = DenseDataset(np.ones((5, 4), dtype=np.float32))
    arr, n = ds.device()
    assert n == 5
    assert arr.shape[0] % 8 == 0 and arr.shape[0] >= 5
    assert np.asarray(arr)[5:].sum() == 0  # zero padding


def test_append_and_cache_invalidation():
    ds = DenseDataset(np.zeros((3, 2), dtype=np.float32))
    arr1, _ = ds.device()
    ds.append(np.array([7.0, 8.0]))
    arr2, n = ds.device()
    assert n == 4
    np.testing.assert_array_equal(np.asarray(arr2)[3], [7.0, 8.0])
    assert arr1.shape == arr2.shape  # still padded to 8


def test_docids():
    c = DocIdCollection(["a", "b"])
    assert c.index_of("b") == 1
    assert c.get(0) == "a"
    with pytest.raises(ScannError):
        c.add("a")
    with pytest.raises(ScannError):
        c.get(5)
    ds = DenseDataset(np.zeros((2, 2), dtype=np.float32), docids=["x", "y"])
    assert ds.docids.index_of("y") == 1
    with pytest.raises(ScannError):
        DenseDataset(np.zeros((2, 2), dtype=np.float32), docids=["only-one"])


def test_datapoint_sparse():
    dp = Datapoint.sparse([1, 4], [2.0, 3.0], dimensionality=6)
    assert dp.is_sparse
    assert dp.get(4) == 3.0 and dp.get(2) == 0.0
    dense = dp.to_dense()
    np.testing.assert_array_equal(dense.values, [0, 2.0, 0, 0, 3.0, 0])
    assert dp.squared_l2_norm() == pytest.approx(13.0)


def test_datapoint_normalize():
    dp = Datapoint.dense([3.0, 4.0]).normalize()
    assert dp.l2_norm() == pytest.approx(1.0)
    z = Datapoint.dense([0.0, 0.0]).normalize()  # zero vector unchanged
    assert z.l2_norm() == 0.0


def test_sparse_dataset():
    sd = SparseDataset(5)
    sd.append([0, 2], [1.0, 2.0])
    sd.append([4], [3.0])
    with pytest.raises(ScannError):
        sd.append([9], [1.0])
    dense = sd.to_dense()
    np.testing.assert_array_equal(dense.numpy()[1], [0, 0, 0, 0, 3.0])
    idx, val = sd.to_padded_csr()
    assert idx.shape == (2, 2)
    assert int(idx[1, 1]) == -1


def test_empty_dataset():
    ds = DenseDataset.empty(7)
    assert ds.is_empty and ds.dimensionality == 7
    arr, n = ds.device()
    assert n == 0 and arr.shape[0] >= 1


def test_sparse_datapoint_unsorted_indices_get():
    """get() binary-searches sparse indices: unsorted construction order
    must not change lookups (indices are normalized to ascending)."""
    from scann_tpu.data.dataset import Datapoint

    p = Datapoint.sparse([5, 2, 9], [1.0, 2.0, 3.0])
    assert p.get(2) == 2.0
    assert p.get(5) == 1.0
    assert p.get(9) == 3.0
    assert p.get(3) == 0.0
    dense = p.to_dense()
    assert dense.get(2) == 2.0 and dense.get(9) == 3.0
