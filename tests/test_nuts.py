"""Iterative NUTS kernel: exact-target recovery + whole-model path.

Recovery test pattern mirrors the reference's per-kernel statistical tests
(SURVEY.md §4: simulate at truth, sample, medians within tolerance), with a
closed-form Gaussian target so the posterior is known exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesfmmm_tpu.samplers.nuts import run_nuts


def test_nuts_gaussian_recovery():
    """Correlated 3-D Gaussian: posterior mean/cov within MC error."""
    A = np.array([[2.0, 0.6, 0.0], [0.6, 1.0, -0.3], [0.0, -0.3, 0.5]])
    cov = A @ A.T
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def lj(tree):
        d = tree["q"] - mu
        return -0.5 * d @ prec @ d

    init = {"q": jax.random.normal(jax.random.PRNGKey(0), (4, 3))}
    tr, diag = run_nuts(jax.random.PRNGKey(1), lj, init, n_warmup=400,
                        n_samples=500, max_depth=8)
    qs = np.asarray(tr["q"]).reshape(-1, 3)
    assert np.asarray(diag["n_divergent"]).sum() == 0
    np.testing.assert_allclose(qs.mean(0), np.asarray(mu), atol=0.25)
    np.testing.assert_allclose(np.cov(qs.T), cov, atol=0.6, rtol=0.25)
    # adaptive trajectories actually engaged (depth > 0 on average)
    assert float(np.asarray(diag["mean_depth"]).mean()) > 0.5


def test_nuts_adapts_trajectory_to_scale():
    """Wider targets need longer trajectories: NUTS depth responds to the
    condition number where fixed-length HMC cannot."""
    scales = jnp.asarray([100.0, 1.0, 0.01])

    def lj(tree):
        return -0.5 * jnp.sum((tree["q"] / scales) ** 2)

    init = {"q": jax.random.normal(jax.random.PRNGKey(2), (2, 3))}
    tr, diag = run_nuts(jax.random.PRNGKey(3), lj, init, n_warmup=500,
                        n_samples=300, max_depth=10)
    qs = np.asarray(tr["q"]).reshape(-1, 3)
    # diagonal mass adaptation + U-turn lengths recover all three scales
    sd = qs.std(0)
    assert 40.0 < sd[0] < 250.0
    assert 0.4 < sd[1] < 2.5
    assert 0.004 < sd[2] < 0.025


def test_fit_nuts_api():
    """fit_hmc(method='nuts') through the user API on a small functional
    model, drop-in compatible with post-processing."""
    from bayesfmmm_tpu import api
    from bayesfmmm_tpu.utils.simulate import simulate_functional

    data, truth = simulate_functional(seed=93, N=16, K=2, P=5, M=2,
                                      n_time=(15, 20))
    res = api.fit_hmc(data, K=2, M=2, n_warmup=120, n_samples=80,
                      n_chains=2, method="nuts", max_depth=6)
    acc = res.hmc_diagnostics["accept_mean"]
    assert (acc > 0.4).all()
    Z = res.traces["Z"]
    np.testing.assert_allclose(Z.sum(-1), 1.0, atol=1e-5)
    assert np.isfinite(res.traces["sigma2"]).all()
