"""Whole-model HMC path: log-joint correctness + sampling sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesfmmm_tpu.config import ModelConfig, Priors
from bayesfmmm_tpu.models import logjoint
from bayesfmmm_tpu.models.likelihood import log_likelihood
from bayesfmmm_tpu.samplers import hmc
from bayesfmmm_tpu.utils.simulate import simulate_functional

HP = Priors()


@pytest.fixture(scope="module")
def setup():
    data, truth = simulate_functional(seed=51, N=20, K=2, P=6, M=2,
                                      n_time=(25, 30))
    cfg = ModelConfig(K=2, P=6, M=2)
    c = jnp.full((2,), 10.0)
    return data, truth, cfg, c


def test_log_joint_finite_and_differentiable(setup):
    data, truth, cfg, c = setup
    lj = logjoint.make_log_joint(data, HP, c)
    unc = logjoint.init_unc(jax.random.PRNGKey(0), cfg, data)
    val = lj(unc)
    assert np.isfinite(float(val))
    g = jax.grad(lj)(unc)
    for leaf in jax.tree.leaves(g):
        if leaf.size:
            assert np.isfinite(np.asarray(leaf)).all()


def test_transform_roundtrip(setup):
    data, truth, cfg, c = setup
    unc = logjoint.init_unc(jax.random.PRNGKey(1), cfg, data)
    st = logjoint.to_state(unc)
    st2 = logjoint.to_state(logjoint.from_state(st))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        if a.size:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_log_joint_likelihood_term_matches(setup):
    """The likelihood portion of the log joint equals models.likelihood."""
    data, truth, cfg, c = setup
    lj1 = logjoint.make_log_joint(data, HP, c, temperature=1.0)
    lj0 = logjoint.make_log_joint(data, HP, c, temperature=0.0)
    unc = logjoint.from_state(truth)
    ll_from_joint = float(lj1(unc)) - float(lj0(unc))
    ll_direct = float(log_likelihood(truth, data))
    assert abs(ll_from_joint - ll_direct) < max(2e-3 * abs(ll_direct), 0.5)


def test_hmc_samples_and_mixes(setup):
    data, truth, cfg, c = setup
    lj = logjoint.make_log_joint(data, HP, c)
    n_chains = 2
    inits = jax.vmap(lambda k: logjoint.init_unc(k, cfg, data))(
        jax.random.split(jax.random.PRNGKey(1), n_chains))
    trace, diag = hmc.run_hmc(jax.random.PRNGKey(2), lj, inits,
                              n_warmup=150, n_samples=80, n_leapfrog=12)
    acc = np.asarray(diag["accept_mean"])
    assert (acc > 0.4).all() and (acc <= 1.0).all()
    states = jax.vmap(jax.vmap(logjoint.to_state))(trace)
    sig = np.asarray(states.sigma2)
    assert np.isfinite(sig).all()
    # sigma2 concentrates within an order of magnitude of truth
    assert np.median(sig) < 10 * float(truth.sigma2)
    # Z stays on the simplex
    Z = np.asarray(states.Z)
    np.testing.assert_allclose(Z.sum(-1), 1.0, atol=1e-5)


def test_covadj_log_joint(setup):
    data, truth = simulate_functional(seed=52, N=15, K=2, P=5, M=2, D=1,
                                      with_eta=True, with_xi=True,
                                      n_time=(15, 20))
    cfg = ModelConfig(K=2, P=5, M=2, D=1, covariate_mean=True,
                      covariate_cov=True)
    c = jnp.full((2,), 10.0)
    lj = logjoint.make_log_joint(data, HP, c)
    unc = logjoint.init_unc(jax.random.PRNGKey(3), cfg, data)
    assert np.isfinite(float(lj(unc)))
    g = jax.grad(lj)(unc)
    assert np.isfinite(np.asarray(g.xi_raw)).all()
    assert np.isfinite(np.asarray(g.eta)).all()


def test_fit_hmc_multivariate():
    """fit_hmc infers the family from the data container (round-1 VERDICT:
    it hardcoded functional) and samples the MV model; trace export applies
    the MV tau reciprocal (UpdateTau.h:58)."""
    import tempfile

    from bayesfmmm_tpu import api
    from bayesfmmm_tpu.io import armaio
    from bayesfmmm_tpu.models.likelihood import log_likelihood
    from bayesfmmm_tpu.utils.simulate import simulate_multivariate

    data, truth = simulate_multivariate(seed=93, N=60, K=2, P=6, M=2,
                                        sigma2=0.05)
    res = api.fit_hmc(data, K=2, M=2, n_warmup=200, n_samples=120,
                      n_chains=2, n_leapfrog=12)
    assert res.config.family == "multivariate"
    acc = res.hmc_diagnostics["accept_mean"]
    assert (acc > 0.4).all()
    truth_ll = float(log_likelihood(truth, data))
    best_tail = res.all_chain_loglik[res.chain_index, -20:].mean()
    assert best_tail > truth_ll - 150, (best_tail, truth_ll)
    with tempfile.TemporaryDirectory() as d:
        api.export_traces(d, res.traces, res.config)
        back = armaio.load_trace_dir(d)
        np.testing.assert_allclose(
            back["Tau"], 1.0 / np.asarray(res.traces["tau"]), rtol=1e-4)


def test_fit_hmc_nuts_hd():
    """HD (tensor-basis) family through the gradient path via NUTS."""
    from bayesfmmm_tpu import api
    from bayesfmmm_tpu.models.likelihood import log_likelihood
    from bayesfmmm_tpu.utils.simulate import simulate_hd_functional

    data, truth = simulate_hd_functional(seed=94, N=12, K=2, M=2,
                                         n_points=(30, 40))
    res = api.fit_hmc(data, K=2, M=2, n_warmup=100, n_samples=60,
                      n_chains=2, method="nuts", max_depth=6)
    assert res.config.family == "hd"
    truth_ll = float(log_likelihood(truth, data))
    best_tail = res.all_chain_loglik[res.chain_index, -20:].mean()
    assert np.isfinite(best_tail)
    assert best_tail > truth_ll - 400, (best_tail, truth_ll)
    sig = np.asarray(res.traces["sigma2"])
    assert np.isfinite(sig).all()


def test_fit_hmc_api():
    """fit_hmc: spectral-initialized whole-model HMC through the user API,
    drop-in compatible with the post-processing layer."""
    from bayesfmmm_tpu import api
    from bayesfmmm_tpu.post import summaries
    data, truth = simulate_functional(seed=91, N=24, K=2, P=6, M=2,
                                      n_time=(25, 30))
    res = api.fit_hmc(data, K=2, M=2, n_warmup=150, n_samples=100,
                      n_chains=2, n_leapfrog=12)
    acc = res.hmc_diagnostics["accept_mean"]
    assert (acc > 0.4).all()
    from bayesfmmm_tpu.models.likelihood import log_likelihood
    truth_ll = float(log_likelihood(truth, data))
    best_tail = res.all_chain_loglik[res.chain_index, -20:].mean()
    # spectral-init HMC must land near truth-level likelihood
    assert best_tail > truth_ll - 150, (best_tail, truth_ll)
    est = res.estimates(burnin_prop=0.3)
    assert float(est["sigma2"]) < 10 * float(truth.sigma2)
    ci = summaries.z_ci(res.traces["Z"], burnin_prop=0.3)
    assert ci["CI_50"].shape == (24, 2)
