"""Post-processing layer tests, including parity runs on the reference's
shipped MCMC trace fixtures (inst/test-data/Functional_trace)."""

import os

import numpy as np
import pytest

from bayesfmmm_tpu import basis
from bayesfmmm_tpu.io import armaio
from bayesfmmm_tpu.post import model_selection, predictive, summaries

TRACE = "/root/reference/inst/test-data/Functional_trace"
MV_TRACE = "/root/reference/inst/test-data/Multivariate_trace"


@pytest.fixture(scope="module")
def func_traces():
    if not os.path.isdir(TRACE):
        pytest.skip("reference fixtures not mounted")
    tr = armaio.load_trace_dir(
        TRACE, names=["Nu", "Phi", "Z", "Sigma", "Chi", "Pi", "Tau"])
    return {"nu": tr["Nu"], "Phi": tr["Phi"], "Z": tr["Z"],
            "sigma2": tr["Sigma"], "chi": tr["Chi"], "pi": tr["Pi"],
            "tau": tr["Tau"]}


@pytest.fixture(scope="module")
def func_basis():
    # Fixture model: basis_degree 3, internal (250,500,750), boundary (0,1000)
    t = np.linspace(0, 1000, 50)
    return basis.bspline_basis(t, 3, np.array([250., 500., 750.]),
                               np.array([0., 1000.]))


def test_mean_ci_on_reference_traces(func_traces, func_basis):
    ci = summaries.mean_ci(func_traces["nu"], func_basis, k=1, rescale=True,
                           Z_samp=func_traces["Z"])
    assert ci["CI_Lower"].shape == (50,)
    assert np.all(ci["CI_Lower"] <= ci["CI_50"] + 1e-12)
    assert np.all(ci["CI_50"] <= ci["CI_Upper"] + 1e-12)
    # simultaneous bands contain pointwise bands
    ci_sim = summaries.mean_ci(func_traces["nu"], func_basis, k=1,
                               rescale=True, simultaneous=True,
                               Z_samp=func_traces["Z"])
    width_pw = ci["CI_Upper"] - ci["CI_Lower"]
    width_sim = ci_sim["CI_Upper"] - ci_sim["CI_Lower"]
    assert np.mean(width_sim >= width_pw - 1e-9) > 0.9


def test_rescale_transform_semantics(func_traces):
    """Row i of T is the Z row of the max-membership observation
    (PostProcessing.cpp:203-220)."""
    Z = func_traces["Z"][:10]
    T = summaries.rescale_transforms(Z)
    for d in range(10):
        for i in range(Z.shape[2]):
            np.testing.assert_array_equal(T[d, i], Z[d, np.argmax(Z[d, :, i])])


def test_cov_ci_on_reference_traces(func_traces, func_basis):
    ci = summaries.cov_ci(func_traces["Phi"], func_basis, func_basis,
                          k=1, l=1, rescale=True, Z_samp=func_traces["Z"])
    assert ci["CI_50"].shape == (50, 50)
    # own-covariance median should be PSD-ish on the diagonal
    assert np.all(np.diag(ci["CI_50"]) > -1e-6)


def test_z_sigma_ci(func_traces):
    zci = summaries.z_ci(func_traces["Z"])
    assert zci["CI_50"].shape == func_traces["Z"].shape[1:]
    assert np.all(zci["CI_Lower"] >= -1e-12)
    assert np.all(zci["CI_Upper"] <= 1 + 1e-12)
    sci = summaries.sigma_ci(func_traces["sigma2"])
    assert sci["CI_Lower"] < sci["CI_50"] < sci["CI_Upper"]
    assert sci["CI_Lower"] > 0


def _synthetic_data_and_traces():
    import jax
    from bayesfmmm_tpu.utils.simulate import simulate_functional
    from bayesfmmm_tpu.samplers import drivers
    from bayesfmmm_tpu.config import Priors
    import jax.numpy as jnp
    data, truth = simulate_functional(seed=9, N=20, K=2, P=6, M=2,
                                      n_time=(30, 40))
    res = drivers.phase_warm_start(jax.random.PRNGKey(0), truth, data,
                                   Priors(), jnp.full((2,), 10.0),
                                   n_iters=60)
    traces = {k: np.asarray(v) for k, v in res.traces.items()}
    return data, traces, truth


@pytest.fixture(scope="module")
def synth():
    return _synthetic_data_and_traces()


def test_model_selection_runs(synth):
    data, traces, truth = synth
    d = model_selection.dic(traces, data, burnin_prop=0.5)
    a = model_selection.aic(traces, data, burnin_prop=0.5)
    b = model_selection.bic(traces, data, burnin_prop=0.5)
    ll = model_selection.loglik_trace(traces, data)
    assert np.isfinite([d, a, b]).all()
    assert ll.shape == (60,)
    # plug-in loglik should be near the chain's stationary loglik
    assert abs(ll[-10:].mean() - ll[-1]) < 200


def test_cpo_reasonable(synth):
    data, traces, truth = synth
    sub = {k: v[-20:] for k, v in traces.items()}
    vals = model_selection.cpo(sub, data, burnin_prop=0.0)
    assert vals.shape == (20,)
    assert np.isfinite(vals).all()
    # Woodbury fast path agrees with the dense reference implementation
    dense = model_selection.cpo_dense(sub, data, burnin_prop=0.0)
    np.testing.assert_allclose(vals, dense, atol=5e-3)


def test_sample_paths(synth):
    data, traces, truth = synth
    out = predictive.sample_paths(traces, data, burnin_prop=0.5)
    N, L = data.y.shape
    assert out["CI_50"].shape == (N, L)
    mask = np.asarray(data.mask) > 0
    # coverage: the 95% predictive band should cover most observed points
    y = np.asarray(data.y)
    inside = ((y >= out["CI_Lower"]) & (y <= out["CI_Upper"]))[mask]
    assert inside.mean() > 0.8


def test_param_count_formula(synth):
    data, traces, _ = synth
    # (N + P) K + 2 P M K + 2 + 4K + N M + M K with N=20,K=2,P=6,M=2
    expect = (20 + 6) * 2 + 2 * 6 * 2 * 2 + 2 + 8 + 40 + 4
    assert model_selection.param_count(traces, data) == expect
