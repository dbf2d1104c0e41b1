"""Zero-copy Arrow→numpy embedding ingestion (functions.vecs)."""

import numpy as np
import pyarrow as pa
import pytest

from spider_ray.functions.vecs import matrix_to_list_array, vectors_to_matrix


def _list_col(mat, typ=pa.float32()):
    n, d = mat.shape
    return pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel().astype(typ.to_pandas_dtype())), d
    ).cast(pa.list_(typ))


def test_list_column_roundtrip():
    mat = np.arange(24, dtype=np.float32).reshape(6, 4)
    out = vectors_to_matrix(pa.chunked_array([_list_col(mat)]))
    assert out.dtype == np.float64
    assert np.array_equal(out, mat.astype(np.float64))


def test_fixed_size_list_and_slice():
    mat = np.arange(40, dtype=np.float64).reshape(10, 4)
    fsl = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), 4)
    assert np.array_equal(vectors_to_matrix(fsl), mat)
    # a sliced array shares the parent values buffer — offsets must hold
    assert np.array_equal(vectors_to_matrix(fsl.slice(3, 4)), mat[3:7])


def test_sliced_variable_list():
    mat = np.arange(40, dtype=np.float64).reshape(10, 4)
    col = _list_col(mat, pa.float64())
    assert np.array_equal(vectors_to_matrix(col.slice(2, 5)), mat[2:7])


def test_zero_copy_no_cast():
    mat = np.arange(12, dtype=np.float64).reshape(3, 4)
    fsl = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), 4)
    out = vectors_to_matrix(fsl)  # float64 → no cast copy
    assert out.base is not None  # a view over Arrow memory, not a fresh copy


def test_ragged_and_null_raise():
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        vectors_to_matrix(ragged)
    with_null = pa.array([[1.0, 2.0], None], pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="null"):
        vectors_to_matrix(with_null)


def test_empty_column():
    empty = pa.array([], pa.list_(pa.float64()))
    assert vectors_to_matrix(empty).shape == (0, 0)


def test_matrix_to_list_array_roundtrip():
    mat = np.arange(12, dtype=np.float64).reshape(4, 3)
    arr = matrix_to_list_array(mat)
    assert arr.type == pa.list_(pa.float64())
    assert np.array_equal(vectors_to_matrix(arr), mat)
    codes = np.arange(8, dtype=np.uint8).reshape(2, 4)
    carr = matrix_to_list_array(codes)
    assert carr.type == pa.list_(pa.uint8())
    assert carr.to_pylist() == [[0, 1, 2, 3], [4, 5, 6, 7]]
