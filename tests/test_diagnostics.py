"""ESS / R-hat estimator correctness on processes with known answers."""

import numpy as np

from bayesfmmm_tpu import diagnostics


def _ar1(n, rho, n_chains=4, seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros((n_chains, n))
    innov = rng.normal(size=(n_chains, n)) * np.sqrt(1 - rho**2)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x


def test_ess_iid():
    x = np.random.default_rng(0).normal(size=(4, 2000))
    ess = diagnostics.effective_sample_size(x)
    assert 0.8 * 8000 < ess < 1.25 * 8000


def test_ess_ar1_known_tau():
    """AR(1) with coefficient rho has integrated autocorrelation time
    (1+rho)/(1-rho); ESS should reflect it within estimator noise."""
    rho = 0.7
    x = _ar1(8000, rho, n_chains=4, seed=1)
    ess = diagnostics.effective_sample_size(x)
    expected = 4 * 8000 * (1 - rho) / (1 + rho)
    assert 0.6 * expected < ess < 1.5 * expected, (ess, expected)


def test_rhat_converged_vs_split():
    x = np.random.default_rng(2).normal(size=(4, 1000))
    assert diagnostics.split_rhat(x) < 1.02
    # chains with different means -> large rhat
    y = x + np.array([0.0, 0.0, 3.0, 3.0])[:, None]
    assert diagnostics.split_rhat(y) > 1.5


def test_rank_normalized_variants():
    rng = np.random.default_rng(3)
    # heavy-tailed chain: plain ESS can be erratic; rank-normalized stable
    x = rng.standard_cauchy(size=(4, 4000))
    ess = diagnostics.rank_normalized_ess(x)
    assert 0.5 * 16000 < ess < 1.3 * 16000
    assert diagnostics.rank_normalized_rhat(x) < 1.05
    # scale-shifted chains detected even after monotone transform
    y = np.abs(x)
    y[2:] *= 10
    assert diagnostics.rank_normalized_rhat(y) > 1.2


def test_summarize_chains():
    x = np.random.default_rng(4).normal(size=(4, 500, 3, 2))
    out = diagnostics.summarize_chains(x)
    assert out["ess_min"] > 500
    assert out["rhat_max"] < 1.05
