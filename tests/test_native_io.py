"""Native C++ trace-IO runtime: parity with the Python path + async writer."""

import os

import numpy as np
import pytest

from bayesfmmm_tpu.io import armaio, native


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native library not built and no toolchain")
    return True


def test_native_matches_python_reader(have_native, tmp_path):
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(37, 11))
    cube = rng.normal(size=(5, 7, 3))
    pm = str(tmp_path / "m.txt")
    pc = str(tmp_path / "c.txt")
    armaio.save_arma_matrix(pm, mat)
    armaio.save_arma_cube(pc, cube)
    np.testing.assert_allclose(native.read_arma_ascii(pm), mat, atol=1e-14)
    np.testing.assert_allclose(native.read_arma_ascii(pc), cube, atol=1e-14)


def test_native_writer_matches_python_reader(have_native, tmp_path):
    rng = np.random.default_rng(1)
    cube = rng.normal(size=(4, 6, 5))
    p = str(tmp_path / "w.txt")
    native.write_arma_ascii(p, cube)
    np.testing.assert_allclose(
        armaio.load_arma(p, prefer_native=False), cube, atol=1e-14)


def test_native_reads_reference_fixture(have_native):
    path = "/root/reference/inst/test-data/Functional_trace/Nu0.txt"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not mounted")
    nat = native.read_arma_ascii(path)
    py = armaio.load_arma(path, prefer_native=False)
    np.testing.assert_array_equal(nat, py)


def test_async_writer(have_native, tmp_path):
    rng = np.random.default_rng(2)
    arrs = [rng.normal(size=(10, 8, 4)) for _ in range(6)]
    with native.AsyncTraceWriter() as w:
        for i, a in enumerate(arrs):
            w.submit(str(tmp_path / f"t{i}.txt"), a)
        assert w.flush() == 0
    for i, a in enumerate(arrs):
        np.testing.assert_allclose(
            armaio.load_arma(str(tmp_path / f"t{i}.txt")), a, atol=1e-14)
