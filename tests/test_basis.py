"""Golden-value basis tests against the reference's shipped fixtures.

Mirrors src/test-BSplines.cpp:56-82: TensorBSpline vs Tensor_BSpline.txt and
GetP vs P_mat.txt at absolute tolerance 1e-7.
"""

import numpy as np
import pytest

from bayesfmmm_tpu import basis
from bayesfmmm_tpu.io import armaio

REF = "/root/reference/inst/test-data"


def _fixture(name):
    import os
    path = os.path.join(REF, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not mounted")
    return armaio.load_arma(path)


def test_tensor_bspline_golden():
    # Parameters from test-BSplines.cpp:9-28
    t = np.stack([np.arange(0, 1000, 10.0)] * 2, axis=1)  # (100, 2)
    B = basis.tensor_bspline_basis(
        t, degrees=[3, 3],
        internal_knots_list=[np.array([250., 500., 750.])] * 2,
        boundary_knots=np.array([[0., 990.], [0., 990.]]))
    B_true = _fixture("Tensor_BSpline.txt")
    assert B.shape == B_true.shape
    np.testing.assert_allclose(B, B_true, atol=1e-7)


def test_tensor_penalty_golden():
    P = basis.tensor_penalty(
        degrees=[3, 3],
        internal_knots_list=[np.array([250., 500., 750.])] * 2)
    P_true = _fixture("P_mat.txt")
    assert P.shape == P_true.shape
    np.testing.assert_allclose(P, P_true, atol=1e-7)


def test_bspline_partition_of_unity():
    t = np.linspace(0.0, 1.0, 57)
    B = basis.bspline_basis(t, 3, np.array([0.25, 0.5, 0.75]),
                            np.array([0.0, 1.0]))
    assert B.shape == (57, 7)
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-12)
    assert np.all(B >= 0)
    # right boundary: last basis function is 1
    np.testing.assert_allclose(B[-1], np.eye(7)[-1], atol=1e-12)


def test_rw1_penalty_structure():
    P = basis.rw1_penalty(5)
    expect = np.array([
        [1, -1, 0, 0, 0],
        [-1, 2, -1, 0, 0],
        [0, -1, 2, -1, 0],
        [0, 0, -1, 2, -1],
        [0, 0, 0, -1, 1],
    ], dtype=float)
    np.testing.assert_array_equal(P, expect)
    # RW1 penalty annihilates constants
    np.testing.assert_allclose(P @ np.ones(5), 0.0, atol=1e-14)


def test_penalty_quadform_equals_first_differences():
    P = basis.rw1_penalty(8)
    v = np.sin(np.arange(8.0))
    np.testing.assert_allclose(v @ P @ v, np.sum(np.diff(v) ** 2), atol=1e-12)
