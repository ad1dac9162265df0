"""Geweke (2004) joint-distribution test of the FULL Gibbs sweep.

The strongest available whole-sampler correctness check: if every
conditional updater leaves its exact conditional invariant, then the
successive-conditional sampler

    theta_{t+1} ~ GibbsSweep(theta_t ; y_t),   y_{t+1} ~ p(y | theta_{t+1})

has the model prior p(theta) as its exact stationary marginal.  Comparing
posterior-functional moments of that chain against iid prior draws detects
*any* systematic error in *any* kernel of the sweep (wrong rate, sign,
scaling, Hastings term, ...), including errors the per-kernel recovery
tests cannot see.

Run on the multivariate family (identity basis => every prior is proper;
the functional RW(1) penalty prior is partially improper and cannot be
sampled).  float64 throughout so simplex underflow never triggers the
boundary escape hatches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
enable_x64 = jax.enable_x64

from bayesfmmm_tpu.config import Priors
from bayesfmmm_tpu.models.state import GibbsState, make_multivariate_data
from bayesfmmm_tpu.ops import gibbs

K, P, M, N = 2, 3, 2, 6
# Hyperparameters are test-specific, for two mixing (NOT correctness)
# reasons — every kernel was verified exactly invariant in isolation
# (Gamma-moment probes to 3 decimals), but the joint successive-conditional
# chain must also MIX across the prior within the run length:
#   1. MH proposal scales: invariance is independent of the proposal, but
#      the production scales (a_Z_PM=10000, var_alpha3=0.05) take near-zero
#      steps relative to the PRIOR's spread (ESS ~ 10 at 6000 draws).
#   2. A's prior is tightened (Gamma(20,10) / Gamma(30,10)): with a diffuse
#      Gamma(2,1) prior the (Phi, delta, A) MGP funnel has a corner
#      (a -> 0, delta -> 0, Phi -> inf) whose escape time exceeds any
#      feasible run — replica chains' 50k-draw means still disagreed by
#      0.4 in E[log delta].  The tight prior removes the corner while every
#      kernel still runs with full coupling.
HP = Priors(b=0.5,            # alpha3 ~ Exp(0.5): keeps alpha3*pi >= O(1)
            alpha_0=3.0, beta_0=2.0,   # sigma2 ~ IG(3,2): finite variance
            alpha1l=20.0, beta1l=10.0, alpha2l=30.0, beta2l=10.0,
            alpha_nu=10.0, beta_nu=1.0, nu_1=3.0,
            a_Z_PM=20.0, a_pi_PM=20.0, var_alpha3=1.0)
C_VEC = np.full(K, 3.0)


def _prior_draw(key):
    """One exact draw from the model prior (references per conditional:
    UpdatePi.h:39-53 [pi ~ Dir(c)], UpdateAlpha3.h:10-26 [alpha3 ~ Exp(b)],
    UpdateMixedMembership.h:37-47 [Z_n ~ Dir(alpha3 pi)], UpdateTau.h:18-36
    [tau ~ Gamma(alpha_nu, beta_nu)], UpdateNu.h:24-74 [nu_k ~ N(0,
    (tau_k pen)^-1), pen = I here], UpdateSigma.h:22-58 [sigma2 ~
    IG(alpha_0, beta_0)], UpdateA.h:17-44 [a_i ~ Gamma(alpha_il, beta_il)],
    UpdateDelta.h:17-64 [delta_0 ~ Gamma(a1,1), delta_m ~ Gamma(a2,1)],
    UpdateGamma.h:17-37 [gamma ~ Gamma(nu1/2, nu1/2)], UpdateChi.h:19-64
    [chi ~ N(0,1)], UpdatePhi.h:76-78 [Phi ~ N(0, 1/(gamma tilde_tau))])."""
    ks = jax.random.split(key, 12)
    dt = jnp.float64
    pi = jax.random.dirichlet(ks[0], jnp.asarray(C_VEC, dt))
    alpha3 = jax.random.exponential(ks[1], dtype=dt) / HP.b
    Z = jax.random.dirichlet(ks[2], alpha3 * pi, shape=(N,))
    tau = jax.random.gamma(ks[3], HP.alpha_nu, (K,), dt) / HP.beta_nu
    nu = jax.random.normal(ks[4], (K, P), dt) / jnp.sqrt(tau)[:, None]
    sigma2 = HP.beta_0 / jax.random.gamma(ks[5], HP.alpha_0, (), dt)
    a1 = jax.random.gamma(ks[6], HP.alpha1l, (K,), dt) / HP.beta1l
    a2 = jax.random.gamma(ks[7], HP.alpha2l, (K,), dt) / HP.beta2l
    A = jnp.stack([a1, a2], axis=1)
    d0 = jax.random.gamma(ks[8], a1, (K,), dt)
    dm = jax.random.gamma(ks[9], a2[:, None].repeat(M - 1, 1),
                          (K, M - 1), dt)
    delta = jnp.concatenate([d0[:, None], dm], axis=1)
    gamma = jax.random.gamma(ks[10], HP.nu_1 / 2.0, (K, P, M), dt) \
        / (HP.nu_1 / 2.0)
    tilde = jnp.cumprod(delta, axis=1)
    k11, k12 = jax.random.split(ks[11])
    Phi = jax.random.normal(k11, (K, P, M), dt) \
        / jnp.sqrt(gamma * tilde[:, None, :])
    chi = jax.random.normal(k12, (N, M), dt)
    z = jnp.zeros
    return GibbsState(
        Z=Z, pi=pi, alpha3=alpha3, nu=nu, tau=tau, sigma2=sigma2, chi=chi,
        Phi=Phi, gamma=gamma, delta=delta, A=A,
        eta=z((K, P, 0), dt), tau_eta=jnp.ones((K, 0), dt),
        xi=z((K, P, 0, M), dt), gamma_xi=jnp.ones((K, P, 0, M), dt),
        delta_xi=jnp.ones((K, M, 0), dt), A_xi=jnp.ones((K, 2, 0), dt))


def _draw_y(key, st):
    """y_n ~ N(sum_k Z_nk (nu_k + Phi_k chi_n), sigma2 I)."""
    w = st.Z @ st.nu + jnp.einsum("nk,kpm,nm->np", st.Z, st.Phi, st.chi)
    return w + jnp.sqrt(st.sigma2) * jax.random.normal(key, w.shape, w.dtype)


def _stats(st):
    """Scalar posterior functionals with finite prior variance.  The Phi
    statistic is standardized: gamma*tilde_tau*Phi^2 ~ chi^2_1 elementwise
    under the prior, so its mean is 1 for BOTH samplers by construction of
    the MGP prior — any kernel bias shows up as a deviation."""
    tilde = jnp.cumprod(st.delta, axis=1)
    return jnp.stack([
        st.alpha3,
        jnp.log(st.sigma2),
        jnp.mean(st.nu ** 2 * st.tau[:, None]),      # ~ chi2_1 mean
        jnp.mean(st.gamma * tilde[:, None, :] * st.Phi ** 2),
        jnp.mean(jnp.log(st.delta)),
        jnp.mean(jnp.log(st.gamma)),
        jnp.mean(st.chi ** 2),
        jnp.mean(st.Z[:, 0]),
        jnp.mean(jnp.log(st.tau)),
        jnp.mean(st.A),
    ])


STAT_NAMES = ["alpha3", "log_sigma2", "nu2_tau", "phi2_std", "log_delta",
              "log_gamma", "chi2", "Z0", "log_tau", "A"]


@pytest.mark.slow
def test_geweke_full_sweep():
    n_mc = 8000          # marginal-conditional (iid prior) draws
    n_sc = 4000          # successive-conditional draws per chain
    n_chains = 8         # independent SC chains from prior starts
    n_burn = 500
    with enable_x64():
        data0 = make_multivariate_data(np.zeros((N, P)), dtype=jnp.float64)
        c = jnp.asarray(C_VEC, jnp.float64)

        @jax.jit
        def mc_stats(key):
            ks = jax.random.split(key, n_mc)
            return jax.lax.map(lambda k: _stats(_prior_draw(k)), ks)

        def sc_run(key):
            st0 = _prior_draw(jax.random.fold_in(key, 0))
            y0 = _draw_y(jax.random.fold_in(key, 1), st0)

            def step(carry, k):
                st, y = carry
                k1, k2 = jax.random.split(k)
                d = data0.replace(y=y, u=y,
                                  yy=jnp.sum(y * y, axis=1))
                st = gibbs.sweep_full(k1, st, d, HP, c)
                y = _draw_y(k2, st)
                return (st, y), _stats(st)

            ks = jax.random.split(jax.random.fold_in(key, 2), n_sc)
            _, stats = jax.lax.scan(step, (st0, y0), ks)
            return stats

        mc = np.asarray(mc_stats(jax.random.PRNGKey(42)))
        sc = np.asarray(jax.jit(jax.vmap(sc_run))(
            jax.random.split(jax.random.PRNGKey(43), n_chains)))

    assert np.isfinite(mc).all() and np.isfinite(sc).all()
    sc = sc[:, n_burn:, :]                      # (chains, draws, stats)
    failures = []
    for j, name in enumerate(STAT_NAMES):
        m1, v1 = mc[:, j].mean(), mc[:, j].var(ddof=1)
        chain_means = sc[:, :, j].mean(axis=1)
        m2 = chain_means.mean()
        # Between-chain SE is honest under arbitrary within-chain
        # autocorrelation (each chain mean is an independent estimate).
        se_sc = chain_means.std(ddof=1) / np.sqrt(n_chains)
        se = np.sqrt(v1 / mc.shape[0] + se_sc ** 2)
        z = (m1 - m2) / se
        if abs(z) > 5.0:
            failures.append(f"{name}: z={z:.2f} (mc={m1:.4f}, sc={m2:.4f}, "
                            f"se_sc={se_sc:.4f})")
    assert not failures, "Geweke z-score failures: " + "; ".join(failures)
    # The standardized chi2_1 statistics also have known exact means.
    assert abs(mc[:, 2].mean() - 1.0) < 0.1
    assert abs(sc[:, :, 2].mean() - 1.0) < 0.15
    assert abs(sc[:, :, 3].mean() - 1.0) < 0.15
