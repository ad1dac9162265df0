"""Truth-recovery tests for the MGP shrinkage tower (delta, gamma, A) and
the xi mirrors — the reference's test pattern, vectorized.

Reference: src/test-Phi.cpp:364-505 (TestUpdateGamma/TestUpdateDelta/
TestUpdateA) with assertions at :1038-1092 (tolerances 0.5 / 2.0 / 0.5).
The pattern: hold the rest of the tower at known truth, redraw Phi (resp.
xi) from its conditional prior N(0, 1/(gamma * tilde_tau)) at truth EVERY
iteration, run ONE updater per iteration, and require the element-wise
posterior median over all draws to recover the truth.  This is exactly the
collapsed check that catches sign/indexing errors in the cumulative-product
rate sums (UpdateDelta.h:17-64) that a runs-and-stays-positive test cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesfmmm_tpu.config import Priors
from bayesfmmm_tpu.models.state import GibbsState
from bayesfmmm_tpu.ops import gibbs


def _mk_state(K, P, M, D=0, N=4):
    f32 = np.float32
    return GibbsState(
        Z=np.full((N, K), 1.0 / K, f32), pi=np.full((K,), 1.0 / K, f32),
        alpha3=f32(1.0), nu=np.zeros((K, P), f32), tau=np.ones((K,), f32),
        sigma2=f32(1.0), chi=np.zeros((N, M), f32),
        Phi=np.zeros((K, P, M), f32), gamma=np.ones((K, P, M), f32),
        delta=np.ones((K, M), f32), A=np.ones((K, 2), f32),
        eta=np.zeros((K, P, D), f32), tau_eta=np.ones((K, D), f32),
        xi=np.zeros((K, P, D, M), f32),
        gamma_xi=np.ones((K, P, D, M), f32),
        delta_xi=np.ones((K, M, D), f32), A_xi=np.ones((K, 2, D), f32))


def _scan_draws(step, state, n_iters, extract, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_iters)

    def body(st, k):
        st = step(st, k)
        return st, extract(st)

    _, draws = jax.jit(lambda s, ks: jax.lax.scan(body, s, ks))(state, keys)
    return np.asarray(draws)


def test_gamma_recovery():
    """updateGamma recovers truth gamma (test-Phi.cpp:364-413, tol 0.5)."""
    K, P, M = 3, 8, 2
    rng = np.random.default_rng(11)
    gamma_truth = rng.gamma(0.5, 2.0, size=(K, P, M)).astype(np.float32)
    delta_truth = np.tile([2.0, 3.0], (K, 1)).astype(np.float32)
    tilde = np.cumprod(delta_truth, axis=1)                     # (K, M)
    sd = (1.0 / np.sqrt(gamma_truth * tilde[:, None, :])).astype(np.float32)
    hp = Priors(nu_1=0.001)
    st = _mk_state(K, P, M).replace(delta=delta_truth)

    def step(st, k):
        k1, k2 = jax.random.split(k)
        st = st.replace(Phi=sd * jax.random.normal(k1, sd.shape, jnp.float32))
        return gibbs.update_gamma(k2, st, hp)

    draws = _scan_draws(step, st, 10000, lambda s: s.gamma)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, gamma_truth, atol=0.5)


def test_delta_recovery():
    """updateDelta recovers truth delta (test-Phi.cpp:416-464, tol 2.0).

    The rate's cumulative-product tail sum (UpdateDelta.h:33-57) is the
    numerically subtle part; a sign or index error there shifts the medians
    far beyond this tolerance.
    """
    K, P, M = 3, 8, 5
    rng = np.random.default_rng(12)
    # Clip the Gamma(2,1) truth to a well-identified range: a tail column's
    # conditional sees only P*(M-i) evidence terms, so an extreme truth draw
    # is legitimately shrunk toward the prior mean (the reference's random
    # truth passes only by the luck of set.seed(1)).
    delta_truth = np.clip(rng.gamma(2.0, 1.0, size=(K, M)),
                          0.5, 4.0).astype(np.float32)
    gamma_truth = rng.gamma(1.5, 1.0 / 1.5, size=(K, P, M)).astype(np.float32)
    tilde = np.cumprod(delta_truth, axis=1)
    sd = (1.0 / np.sqrt(gamma_truth * tilde[:, None, :])).astype(np.float32)
    hp = Priors()
    st = _mk_state(K, P, M).replace(
        gamma=gamma_truth, A=np.full((K, 2), 2.0, np.float32))

    def step(st, k):
        k1, k2 = jax.random.split(k)
        st = st.replace(Phi=sd * jax.random.normal(k1, sd.shape, jnp.float32))
        return gibbs.update_delta(k2, st, hp)

    draws = _scan_draws(step, st, 10000, lambda s: s.delta)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, delta_truth, atol=2.0)
    # Tighter than the reference: the medians must also track truth in
    # aggregate (catches a uniform bias the loose atol would let through).
    assert abs(np.mean(med - delta_truth)) < 0.5


def test_a_recovery():
    """updateA's MH chain centers on the delta evidence
    (test-Phi.cpp:468-505, tol 0.5: delta=(2,3,3,3,3) -> A approx (2,3))."""
    K, M = 3, 5
    delta = np.tile([2.0, 3.0, 3.0, 3.0, 3.0], (K, 1)).astype(np.float32)
    hp = Priors(alpha1l=2.0, beta1l=1.0, alpha2l=3.0, beta2l=1.0,
                var_epsilon1=1.0, var_epsilon2=1.0)
    st = _mk_state(K, 8, M).replace(delta=delta)

    draws = _scan_draws(lambda s, k: gibbs.update_a(k, s, hp), st, 1000,
                        lambda s: s.A)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, np.tile([2.0, 3.0], (K, 1)), atol=0.5)


def test_gamma_xi_recovery():
    """updateGammaXi mirror (UpdateGamma.h:48-73) under the same pattern."""
    K, P, M, D = 2, 6, 2, 2
    rng = np.random.default_rng(13)
    gamma_truth = rng.gamma(0.5, 2.0, size=(K, P, D, M)).astype(np.float32)
    delta_truth = np.broadcast_to(
        np.array([2.0, 3.0], np.float32)[None, :, None], (K, M, D)).copy()
    tilde = np.cumprod(delta_truth, axis=1)                     # (K, M, D)
    # xi[k,p,d,m] ~ N(0, 1/(gamma_xi[k,p,d,m] * tilde[k,m,d]))
    sd = (1.0 / np.sqrt(
        gamma_truth * tilde.transpose(0, 2, 1)[:, None, :, :])
    ).astype(np.float32)
    hp = Priors(nu_1=0.001)
    st = _mk_state(K, P, M, D=D).replace(delta_xi=delta_truth)

    def step(st, k):
        k1, k2 = jax.random.split(k)
        st = st.replace(xi=sd * jax.random.normal(k1, sd.shape, jnp.float32))
        return gibbs.update_gamma_xi(k2, st, hp)

    draws = _scan_draws(step, st, 10000, lambda s: s.gamma_xi)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, gamma_truth, atol=0.5)


def test_delta_xi_recovery():
    """updateDeltaXi mirror (UpdateDelta.h:76-125)."""
    K, P, M, D = 2, 6, 4, 2
    rng = np.random.default_rng(14)
    delta_truth = np.clip(rng.gamma(2.0, 1.0, size=(K, M, D)),
                          0.5, 4.0).astype(np.float32)  # see test_delta_recovery
    gamma_truth = rng.gamma(1.5, 1.0 / 1.5,
                            size=(K, P, D, M)).astype(np.float32)
    tilde = np.cumprod(delta_truth, axis=1)
    sd = (1.0 / np.sqrt(
        gamma_truth * tilde.transpose(0, 2, 1)[:, None, :, :])
    ).astype(np.float32)
    hp = Priors()
    st = _mk_state(K, P, M, D=D).replace(
        gamma_xi=gamma_truth, A_xi=np.full((K, 2, D), 2.0, np.float32))

    def step(st, k):
        k1, k2 = jax.random.split(k)
        st = st.replace(xi=sd * jax.random.normal(k1, sd.shape, jnp.float32))
        return gibbs.update_delta_xi(k2, st, hp)

    draws = _scan_draws(step, st, 10000, lambda s: s.delta_xi)
    med = np.median(draws, axis=0)
    np.testing.assert_allclose(med, delta_truth, atol=2.0)
    assert abs(np.mean(med - delta_truth)) < 0.5


def test_a_xi_recovery():
    """updateAXi mirror (UpdateA.h:137-205)."""
    K, M, D = 2, 5, 2
    delta_xi = np.broadcast_to(
        np.array([2.0, 3.0, 3.0, 3.0, 3.0], np.float32)[None, :, None],
        (K, M, D)).copy()
    hp = Priors(alpha1l=2.0, beta1l=1.0, alpha2l=3.0, beta2l=1.0)
    st = _mk_state(K, 6, M, D=D).replace(delta_xi=delta_xi)

    draws = _scan_draws(lambda s, k: gibbs.update_a_xi(k, s, hp), st, 1000,
                        lambda s: s.A_xi)
    med = np.median(draws, axis=0)
    expected = np.broadcast_to(
        np.array([2.0, 3.0], np.float32)[None, :, None], (K, 2, D))
    np.testing.assert_allclose(med, expected, atol=0.5)
