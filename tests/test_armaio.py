"""Armadillo IO: fixture loading + roundtrip of the trace-file contract."""

import os

import numpy as np
import pytest

from bayesfmmm_tpu.io import armaio

TRACE = "/root/reference/inst/test-data/Functional_trace"


def _need_fixtures():
    if not os.path.isdir(TRACE):
        pytest.skip("reference trace fixtures not mounted")


def test_load_functional_trace_shapes():
    _need_fixtures()
    nu = armaio.load_arma(os.path.join(TRACE, "Nu0.txt"))
    assert nu.shape == (150, 2, 7)          # (iters, K, P)
    z = armaio.load_arma(os.path.join(TRACE, "Z0.txt"))
    assert z.shape == (150, 40, 2)          # (iters, N, K)
    # Every Z row lies on the simplex
    np.testing.assert_allclose(z.sum(axis=2), 1.0, atol=1e-8)
    sigma = armaio.load_arma(os.path.join(TRACE, "Sigma0.txt"))
    assert sigma.shape == (150, 1)
    assert np.all(sigma > 0)


def test_load_binary_field_of_cubes():
    _need_fixtures()
    phi = armaio.load_arma(os.path.join(TRACE, "Phi0.txt"))
    assert phi.shape[0] == 150              # iterations
    assert phi.ndim == 4                    # raw: (iters, M, K, P)
    assert phi.shape[1:] == (3, 2, 7)
    assert np.isfinite(phi).all()
    # trace-layer loader delivers the internal (iters, K, P, M) layout
    traces = armaio.load_trace_dir(TRACE, names=["Phi"])
    assert traces["Phi"].shape == (150, 2, 7, 3)
    np.testing.assert_array_equal(traces["Phi"][5, :, :, 1], phi[5, 1])


def test_load_trace_dir():
    _need_fixtures()
    traces = armaio.load_trace_dir(TRACE, names=["Nu", "Pi", "Sigma", "Z"])
    assert traces["Nu"].shape == (150, 2, 7)
    assert traces["Pi"].shape == (150, 2)
    np.testing.assert_allclose(traces["Pi"].sum(axis=1), 1.0, atol=1e-8)
    assert traces["Sigma"].shape == (150,)


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    traces = {
        "Nu": rng.normal(size=(10, 3, 8)),
        "Pi": rng.dirichlet(np.ones(3), size=10),
        "Sigma": rng.gamma(2.0, size=10),
        "alpha_3": rng.gamma(2.0, size=10),
        "Tau": rng.gamma(2.0, size=(10, 3)),
        "Phi": rng.normal(size=(10, 3, 8, 2)),
        "Z": rng.dirichlet(np.ones(3), size=(10, 20)),
    }
    armaio.save_trace_dir(str(tmp_path), traces)
    back = armaio.load_trace_dir(str(tmp_path))
    for name, arr in traces.items():
        np.testing.assert_allclose(back[name], arr, atol=1e-12,
                                   err_msg=name)


def test_ascii_cube_matches_reference_convention(tmp_path):
    """Cube roundtrip through our writer parses identically to fixtures."""
    cube = np.arange(24.0).reshape(4, 3, 2)  # (slices, rows, cols)
    p = tmp_path / "c.txt"
    armaio.save_arma_cube(str(p), cube)
    txt = p.read_text().splitlines()
    assert txt[0].startswith("ARMA_CUB_TXT")
    assert txt[1] == "3 2 4"
    back = armaio.load_arma(str(p))
    np.testing.assert_array_equal(back, cube)


def test_covadj_trace_roundtrip(tmp_path):
    """Eta/Xi/Delta_Xi/A_Xi follow the reference's field layouts
    (BFMMM.h:4522-4523, :5163-5166)."""
    rng = np.random.default_rng(0)
    it, K, P, D, M = 7, 2, 5, 3, 4
    traces = {
        "Eta": rng.normal(size=(it, K, P, D)),
        "Tau_Eta": rng.gamma(2, size=(it, K, D)),
        "Xi": rng.normal(size=(it, K, P, D, M)),
        "Gamma_Xi": rng.gamma(2, size=(it, K, P, D, M)),
        "Delta_Xi": rng.gamma(2, size=(it, K, M, D)),
        "A_Xi": rng.gamma(2, size=(it, K, 2, D)),
    }
    armaio.save_trace_dir(str(tmp_path), traces)
    back = armaio.load_trace_dir(str(tmp_path))
    for k, v in traces.items():
        np.testing.assert_allclose(back[k], v, atol=1e-12, err_msg=k)


def test_covadj_reference_fixtures_load():
    _need_fixtures()
    ref = armaio.load_trace_dir(
        TRACE, names=["Eta", "Xi", "Delta_Xi", "A_Xi", "Tau_Eta",
                      "Gamma_Xi"])
    # fixture model: K=2, P=7, D=1, M=3, 150 draws
    assert ref["Eta"].shape == (150, 2, 7, 1)
    assert ref["Xi"].shape == (150, 2, 7, 1, 3)
    assert ref["Delta_Xi"].shape == (150, 2, 3, 1)
    assert ref["A_Xi"].shape == (150, 2, 2, 1)
    assert ref["Tau_Eta"].shape == (150, 2, 1)
    for v in ref.values():
        assert np.isfinite(v).all()
