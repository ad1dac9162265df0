"""End-to-end pipeline tests through the user-facing API."""

import numpy as np
import pytest

from bayesfmmm_tpu import api
from bayesfmmm_tpu.config import Priors
from bayesfmmm_tpu.utils.simulate import simulate_functional, simulate_multivariate


def test_functional_pipeline(tmp_path):
    data, truth = simulate_functional(seed=21, N=30, K=2, P=6, M=2,
                                      n_time=(30, 40))
    r1 = api.fit_nu_z(data=data, K=2, M=2, tot_mcmc_iters=150, n_try=1)
    assert r1.loglik.shape == (150,)
    r2 = api.fit_theta(r1, tot_mcmc_iters=150, n_try=1)
    r3 = api.fit_warm_start(r1, r2, tot_mcmc_iters=150, thinning_num=1,
                            directory=str(tmp_path))
    # loglik increases across phases as structure is learned
    assert np.mean(r3.loglik[-20:]) > np.mean(r1.loglik[:20])
    # trace export follows the reference file contract
    files = sorted(p.name for p in tmp_path.iterdir())
    for stem in ("Nu0", "Chi0", "Pi0", "alpha_30", "A0", "Delta0",
                 "Sigma0", "Tau0", "Gamma0", "Phi0", "Z0"):
        assert f"{stem}.txt" in files, stem
    # reloadable + shapes line up with README.md:33-51 conventions
    from bayesfmmm_tpu.io import armaio
    back = armaio.load_trace_dir(str(tmp_path))
    assert back["Nu"].shape == (150, 2, 6)
    assert back["Z"].shape == (150, 30, 2)
    np.testing.assert_allclose(back["Z"].sum(axis=2), 1.0, atol=1e-6)


def test_multivariate_pipeline():
    data, truth = simulate_multivariate(seed=22, N=100, K=2, P=5, M=2)
    r1 = api.fit_nu_z(data=data, K=2, M=2, family="multivariate",
                      tot_mcmc_iters=120, n_try=1)
    r2 = api.fit_theta(r1, tot_mcmc_iters=120, n_try=1)
    r3 = api.fit_warm_start(r1, r2, tot_mcmc_iters=120)
    assert np.isfinite(np.asarray(r3.loglik)).all()
    # cold-start MM fits are multimodal (the reference mitigates with serial
    # restarts + tempered transitions); the pipeline contract here is
    # monotone improvement and a sane noise estimate, while exact posterior
    # correctness is covered by the warm-from-truth stationarity test below.
    assert np.mean(r3.loglik[-20:]) > np.mean(r1.loglik[:20])
    est = r3.estimates(burnin_prop=0.5)
    assert 0 < float(est["sigma2"]) < 1.0


def test_multivariate_warm_from_truth_stationary():
    """Warm-started at truth, the sampler must stay near truth-level
    posterior mass (catches any systematically wrong conditional)."""
    import jax
    import jax.numpy as jnp
    from bayesfmmm_tpu.samplers import drivers
    from bayesfmmm_tpu.models.likelihood import log_likelihood
    data, truth = simulate_multivariate(seed=22, N=100, K=2, P=5, M=2)
    res = drivers.phase_warm_start(jax.random.PRNGKey(0), truth, data,
                                   Priors(), jnp.full((2,), 10.0),
                                   n_iters=200)
    est = drivers.posterior_median_state(res.traces, burnin_prop=0.5)
    # sigma2 stays the right order of magnitude (posterior spread allows ~2x)
    assert float(est["sigma2"]) < 6 * float(truth.sigma2)
    # Z medians track truth memberships
    z_err = np.abs(np.asarray(est["Z"]) - np.asarray(truth.Z)).mean()
    assert z_err < 0.1


def test_covariate_adjusted_pipeline():
    data, truth = simulate_functional(seed=23, N=30, K=2, P=6, M=2, D=1,
                                      with_eta=True, n_time=(25, 30))
    r1 = api.fit_nu_z(data=data, K=2, M=2, tot_mcmc_iters=120, n_try=1)
    assert r1.config.covariate_mean
    r2 = api.fit_theta(r1, tot_mcmc_iters=120, covariate_cov=True)
    assert r2.config.covariate_cov
    r3 = api.fit_warm_start(r1, r2, tot_mcmc_iters=120)
    assert np.isfinite(np.asarray(r3.loglik)).all()
    # eta trace nontrivial
    assert np.asarray(r3.traces["eta"]).std() > 0
    assert np.asarray(r3.traces["xi"]).std() > 0


def test_validation_errors():
    data, _ = simulate_functional(seed=24, N=10, K=2, P=5, M=1,
                                  n_time=(10, 12))
    with pytest.raises(ValueError, match="tot_mcmc_iters"):
        api.fit_nu_z(data=data, K=2, M=1, tot_mcmc_iters=50)
    with pytest.raises(ValueError, match="'K'"):
        api.fit_nu_z(data=data, K=1, M=1, tot_mcmc_iters=100)
    with pytest.raises(ValueError, match="internal_knots"):
        api.build_data([np.zeros(5)], [np.linspace(0, 1, 5)],
                       basis_degree=3, internal_knots=np.array([2.0]),
                       boundary_knots=np.array([0.0, 1.0]))


def test_tempered_transitions_pipeline():
    data, truth = simulate_functional(seed=25, N=20, K=2, P=5, M=2,
                                      n_time=(20, 25))
    r1 = api.fit_nu_z(data=data, K=2, M=2, tot_mcmc_iters=100, n_try=1)
    r2 = api.fit_theta(r1, tot_mcmc_iters=100)
    r3 = api.fit_warm_start(r1, r2, tot_mcmc_iters=120, n_temp_trans=40,
                            beta_N_t=0.5, N_t=2)
    assert np.isfinite(np.asarray(r3.loglik)).all()


def test_spectral_init_beats_random_on_multimodal_mv():
    """Moment-based archetypal init (utils/init_strategies.py) must reach a
    far better mode than random cold starts on the latent-heavy MV config."""
    data, truth = simulate_multivariate(seed=22, N=100, K=2, P=5, M=2)
    r1 = api.fit_nu_z(data=data, K=2, M=2, family="multivariate",
                      tot_mcmc_iters=150, n_try=1, init="spectral")
    r2 = api.fit_theta(r1, tot_mcmc_iters=150)
    r3 = api.fit_warm_start(r1, r2, tot_mcmc_iters=200)
    # random cold starts plateau near loglik -280 on this config; the
    # spectral pipeline must clear zero decisively
    assert np.mean(r3.loglik[-20:]) > 100.0
    est = r3.estimates(burnin_prop=0.5)
    assert float(est["sigma2"]) < 0.08


def test_advi_init_pipeline():
    data, truth = simulate_multivariate(seed=22, N=100, K=2, P=5, M=2)
    res = api.fit_advi_init(data, K=2, M=2, warm_iters=150, advi_steps=150,
                            n_chains=2)
    assert np.isfinite(res.all_chain_loglik).all()
    assert res.elbo_trace[-10:].mean() > res.elbo_trace[:10].mean()


def test_reference_api_priors_plumbing():
    """Reference-named hyperparameters reach the sampler (they are not
    silently dropped), and unknown names raise like a bad R call."""
    from bayesfmmm_tpu import reference_api as ra

    hp = ra._priors_from_kwargs(dict(b=5.0, alpha_nu=2.0, c=[1.0, 2.0]))
    assert hp.b == 5.0 and hp.alpha_nu == 2.0 and hp.c == (1.0, 2.0)
    with pytest.raises(TypeError):
        ra._priors_from_kwargs(dict(not_a_prior=1.0))
    with pytest.raises(ValueError):
        ra._priors_from_kwargs(dict(b=-1.0))

    rng = np.random.default_rng(31)
    t_list = [np.sort(rng.uniform(0, 1, rng.integers(10, 13)))
              for _ in range(10)]
    y_list = [np.sin(2 * np.pi * t) + 0.1 * rng.normal(size=t.shape)
              for t in t_list]
    res = ra.BFMMM_Nu_Z_multiple_try(
        150, 1, 2, y_list, t_list, 10, 3, 2, [0.0, 1.0],
        np.linspace(0.25, 0.75, 2), b=5.0, alpha_nu=2.0)
    assert res.loglik.shape == (150,)
