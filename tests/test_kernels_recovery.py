"""Statistical recovery tests for conditional updaters.

The reference's dominant test pattern (src/test-Nu.cpp:9-105 template,
~6,500 LoC across 7 files): (a) simulate data from the exact model with
known truth; (b) run ONE conditional updater for ~500 iterations holding all
other parameters at truth; (c) element-wise posterior medians of the last
draws must be within tol 0.2-0.3 of truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesfmmm_tpu.config import Priors
from bayesfmmm_tpu.ops import gibbs
from bayesfmmm_tpu.ops.mean import build_cache
from bayesfmmm_tpu.utils.simulate import simulate_functional, simulate_multivariate

HP = Priors()


def _run_kernel(kernel, state, data, n_iters=500, keep=200, seed=0,
                needs_cache=True, extract=None):
    """Scan one updater, returning stacked draws of `extract(state)`."""
    def step(carry, k):
        st = carry
        if needs_cache:
            cache = build_cache(data, st)
            out = kernel(k, st, cache)
            st = out[0] if isinstance(out, tuple) else out
        else:
            out = kernel(k, st)
            st = out[0] if isinstance(out, tuple) else out
        return st, extract(st)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_iters)
    _, draws = jax.lax.scan(step, state, keys)
    return np.asarray(draws[-keep:])


@pytest.fixture(scope="module")
def func_data():
    return simulate_functional(seed=1, N=40, K=3, P=8, M=2)


@pytest.fixture(scope="module")
def mv_data():
    return simulate_multivariate(seed=2, N=200, K=2, P=6, M=2)


def test_nu_recovery(func_data):
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_nu(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.nu)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.nu), atol=0.3)


def test_nu_recovery_mv(mv_data):
    data, truth = mv_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_nu(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.nu)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.nu), atol=0.3)


def test_nu_tempered_recovery(func_data):
    """Tempered variant at beta=0.5 still centers on truth (UpdateNu.h:93)."""
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_nu(k, st, data, HP, cache, beta=0.5),
        truth, data, extract=lambda st: st.nu)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.nu), atol=0.3)


def test_phi_recovery(func_data):
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_phi(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.Phi)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.Phi), atol=0.3)


def test_chi_recovery(func_data):
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_chi(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.chi)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.chi), atol=0.25)


def test_sigma_recovery(func_data):
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_sigma(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.sigma2)
    med = np.median(draws, axis=0)
    assert abs(med - float(truth.sigma2)) < 0.01


def test_z_recovery(func_data):
    """Partial membership recovery (test-PartialMembership.cpp pattern)."""
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_z(k, st, data, HP, cache),
        truth, data, n_iters=1000, keep=400, extract=lambda st: st.Z)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.Z), atol=0.2)


def test_tau_gibbs_moments(func_data):
    """tau | nu is exactly Gamma(alpha + P/2, beta + q/2): check moments."""
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st: gibbs.update_tau(k, st, data, HP),
        truth, data, n_iters=4000, keep=4000, needs_cache=False,
        extract=lambda st: st.tau)
    P = truth.nu.shape[1]
    quad = np.einsum("kp,pq,kq->k", np.asarray(truth.nu),
                     np.asarray(data.pen), np.asarray(truth.nu))
    a = HP.alpha_nu + P / 2.0
    rate = HP.beta_nu + 0.5 * quad
    np.testing.assert_allclose(draws.mean(axis=0), a / rate, rtol=0.1)
    np.testing.assert_allclose(draws.var(axis=0), a / rate**2, rtol=0.25)


def test_delta_gamma_a_tower_runs(func_data):
    """MGP tower: delta/gamma/A kernels produce finite positive draws."""
    _, truth = func_data
    key = jax.random.PRNGKey(0)
    st = truth
    for i in range(50):
        k = jax.random.fold_in(key, i)
        k1, k2, k3 = jax.random.split(k, 3)
        st = gibbs.update_delta(k1, st, HP)
        st = gibbs.update_gamma(k2, st, HP)
        st = gibbs.update_a(k3, st, HP)
    assert np.all(np.asarray(st.delta) > 0)
    assert np.all(np.asarray(st.gamma) > 0)
    assert np.all(np.asarray(st.A) > 0)
    assert np.isfinite(np.asarray(st.delta)).all()


def test_eta_recovery():
    """Covariate-adjusted mean recovery (test-Eta.cpp pattern)."""
    data, truth = simulate_functional(seed=3, N=60, K=2, P=8, M=2, D=2,
                                      with_eta=True)
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_eta(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.eta)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.eta), atol=0.3)


def test_xi_recovery():
    """Covariate-adjusted covariance recovery (test-Xi.cpp pattern)."""
    data, truth = simulate_functional(seed=4, N=60, K=2, P=8, M=2, D=1,
                                      with_eta=True, with_xi=True)
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_xi(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.xi)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.xi), atol=0.35)


def test_pi_alpha3_mh_moves():
    """pi/alpha3 MH kernels mix and stay on their supports."""
    data, truth = simulate_functional(seed=5, N=40, K=3, P=8, M=2)
    c = jnp.full((3,), 10.0)
    st = truth
    key = jax.random.PRNGKey(0)
    pis, a3s = [], []
    for i in range(300):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        st = gibbs.update_pi(k1, st, HP, c)
        st = gibbs.update_alpha3(k2, st, HP)
        pis.append(np.asarray(st.pi))
        a3s.append(float(st.alpha3))
    pis = np.stack(pis)
    np.testing.assert_allclose(pis.sum(axis=1), 1.0, atol=1e-5)
    assert np.std(a3s) > 0          # chain moved
    assert np.all(np.asarray(a3s) > 0)
    # pi posterior should track the mean membership of Z (truth Z ~ Dir(1))
    np.testing.assert_allclose(pis[-100:].mean(axis=0),
                               np.asarray(truth.Z).mean(axis=0), atol=0.15)


def test_phi_recovery_sequential_fallback(func_data, monkeypatch):
    """The sequential blocked path (used above _JOINT_MAX_DIM) must target
    the same conditional as the joint draw."""
    monkeypatch.setattr(gibbs, "_JOINT_MAX_DIM", 0)
    data, truth = func_data
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_phi(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.Phi)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.Phi), atol=0.3)


def test_xi_recovery_sequential_fallback(monkeypatch):
    monkeypatch.setattr(gibbs, "_JOINT_MAX_DIM", 0)
    data, truth = simulate_functional(seed=4, N=60, K=2, P=8, M=2, D=1,
                                      with_eta=True, with_xi=True)
    draws = _run_kernel(
        lambda k, st, cache: gibbs.update_xi(k, st, data, HP, cache),
        truth, data, extract=lambda st: st.xi)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.asarray(truth.xi), atol=0.35)
