"""Parallel tempering, SMC, ADVI: correctness and integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesfmmm_tpu.config import ModelConfig, Priors
from bayesfmmm_tpu.models import logjoint
from bayesfmmm_tpu.models.state import init_state
from bayesfmmm_tpu.parallel import tempering
from bayesfmmm_tpu.samplers import advi, smc
from bayesfmmm_tpu.utils.simulate import simulate_functional

HP = Priors()


@pytest.fixture(scope="module")
def setup():
    data, truth = simulate_functional(seed=61, N=16, K=2, P=5, M=2,
                                      n_time=(15, 20))
    cfg = ModelConfig(K=2, P=5, M=2)
    c = jnp.full((2,), 10.0)
    return data, truth, cfg, c


def test_geometric_ladder():
    lad = np.asarray(tempering.geometric_ladder(5, 0.2))
    assert lad[0] == 1.0
    np.testing.assert_allclose(lad[-1], 0.2, rtol=1e-6)
    assert np.all(np.diff(lad) < 0)


def test_parallel_tempering_runs_and_swaps(setup):
    data, truth, cfg, c = setup
    R = 4
    keys = jax.random.split(jax.random.PRNGKey(0), R)
    # replicas all start from truth-adjacent states for a quick test
    states = jax.vmap(lambda k: init_state(k, cfg, data))(keys)
    cold_trace, pt, rate = jax.jit(
        lambda k, s: tempering.run_parallel_tempering(
            k, s, data, HP, c, n_rounds=30, beta_min=0.4))(
        jax.random.PRNGKey(1), states)
    assert np.isfinite(np.asarray(cold_trace.sigma2)).all()
    r = float(rate)
    assert 0.0 <= r <= 1.0
    # with a mild ladder, some swaps must be accepted
    assert r > 0.05, f"swap rate {r}"
    # cold chain Z stays on the simplex
    np.testing.assert_allclose(
        np.asarray(cold_trace.Z).sum(-1), 1.0, atol=1e-5)


def test_auto_ladder_sizing():
    """auto_ladder (round-4 VERDICT #4): rung spacing follows the measured
    energy sd; an infeasible bridge (large-n posterior, sd(E) ~ sqrt(n))
    is clamped and flagged instead of silently returning a dead ladder."""
    # small sd: few rungs, reaches beta_min, feasible
    lad, ok = tempering.auto_ladder(5.0, 0.3, target_accept=0.4)
    assert ok and float(lad[0]) == 1.0
    np.testing.assert_allclose(float(lad[-1]), 0.3, atol=1e-6)
    assert lad.shape[0] <= 6
    # spacing ~ z/sd: half the acceptance-implied z per unit sd
    db = float(lad[0] - lad[1])
    assert 0.15 < db * 5.0 < 0.75
    # large sd (near the headline scale): needs ~60 rungs, still feasible
    lad2, ok2 = tempering.auto_ladder(70.0, 0.3, max_replicas=64)
    assert ok2 and 40 <= lad2.shape[0] <= 64
    # infeasible: sd(E) ~ 1e3 would need ~560 rungs -> clamped + flagged
    lad3, ok3 = tempering.auto_ladder(1000.0, 0.3, max_replicas=64)
    assert not ok3
    assert lad3.shape[0] == 64
    assert float(lad3[-1]) > 0.3     # only the reachable range is spanned
    assert np.all(np.diff(np.asarray(lad3)) < 0)


def test_fit_pt_auto_ladder_and_swap_warning(setup):
    """fit_pt with ladder='auto' sizes the ladder from a measured pilot
    and achieves a NONZERO swap rate on a feasible config; a fixed
    geometric ladder with a hopeless spacing raises the swap-rate warning
    instead of passing silently (round-4 VERDICT #4)."""
    import warnings

    from bayesfmmm_tpu import api
    data, truth, cfg, c = setup
    r1 = api.fit_nu_z(data=data, K=2, M=2, tot_mcmc_iters=100, seed=0)
    r2 = api.fit_theta(r1, tot_mcmc_iters=100, seed=1)
    res = api.fit_pt(r1, r2, tot_mcmc_iters=150, beta_min=0.5,
                     ladder="auto", pilot_sweeps=60, max_replicas=8,
                     seed=3)
    assert res.ladder is not None and res.ladder.shape[0] >= 2
    assert res.swap_rate > 0.0, res.swap_rate
    # hopeless fixed ladder: 2 rungs spanning 1 -> 0.01 on this posterior
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        api.fit_pt(r1, r2, tot_mcmc_iters=100, n_replicas=2,
                   beta_min=0.01, ladder="geometric", seed=4)
    assert any("swap rate" in str(x.message) for x in w)


def test_smc_anneals_to_posterior(setup):
    data, truth, cfg, c = setup
    N_part = 16
    keys = jax.random.split(jax.random.PRNGKey(2), N_part)
    particles = jax.vmap(lambda k: init_state(k, cfg, data))(keys)
    res = jax.jit(lambda k, p: smc.run_smc(
        k, p, data, HP, c, n_mutation_sweeps=2, target_cess=0.5,
        max_stages=200))(jax.random.PRNGKey(3), particles)
    assert float(res.final_beta) == 1.0
    assert int(res.n_stages) >= 2
    assert np.isfinite(float(res.log_evidence))
    sig = np.asarray(res.particles.sigma2)
    assert np.isfinite(sig).all() and (sig > 0).all()


def test_systematic_resampling_unbiased():
    key = jax.random.PRNGKey(0)
    log_w = jnp.log(jnp.asarray([0.5, 0.25, 0.125, 0.125]))
    counts = np.zeros(4)
    for i in range(200):
        anc = np.asarray(smc.systematic_resample(
            jax.random.fold_in(key, i), log_w))
        counts += np.bincount(anc, minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.5, 0.25, 0.125, 0.125], atol=0.02)


def test_advi_improves_elbo_and_inits(setup):
    data, truth, cfg, c = setup
    lj = logjoint.make_log_joint(data, HP, c)
    unc0 = logjoint.init_unc(jax.random.PRNGKey(4), cfg, data)
    res = advi.run_advi(jax.random.PRNGKey(5), lj, unc0, n_steps=200,
                        learning_rate=0.05)
    elbo = np.asarray(res.elbo_trace)
    assert elbo[-20:].mean() > elbo[:20].mean() + 100
    # the variational mean maps to a valid model state
    st = logjoint.to_state(res.mean)
    assert float(st.sigma2) > 0
    np.testing.assert_allclose(np.asarray(st.Z).sum(-1), 1.0, atol=1e-5)
    # samples from q are finite states
    samples = advi.sample_from_advi(jax.random.PRNGKey(6), res, n_samples=3)
    sts = jax.vmap(logjoint.to_state)(samples)
    assert np.isfinite(np.asarray(sts.nu)).all()
