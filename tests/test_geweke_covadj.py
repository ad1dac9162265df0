"""Geweke joint-distribution tests: covariate-adjusted tower and the
production (collapsed-Z + gauge) sweep.

Round-2 VERDICT weak #5: the original Geweke proof ran the plain MV sweep,
leaving update_eta / update_xi / update_delta_xi / update_gamma_xi /
update_a_xi / update_tau_eta outside the joint invariance proof.  This file
adds a D=1 multivariate configuration whose successive-conditional sweep
exercises the full covariate-adjusted kernel census (BFMMM.h:4810-4893
order), plus a second test proving the NEW production kernels — the
partially collapsed (Z, chi) block and the gauge MH moves (ops/gibbs.py) —
leave the joint distribution invariant.

Methodology and the mixing-only hyperparameter choices: see
tests/test_geweke.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesfmmm_tpu.config import Priors
from bayesfmmm_tpu.models.state import GibbsState, make_multivariate_data
from bayesfmmm_tpu.ops import gibbs
from bayesfmmm_tpu.ops.mean import effective_coeffs

from tests.test_geweke import (C_VEC, HP, K, M, N, P, _draw_y, _prior_draw,
                               _stats, STAT_NAMES)

enable_x64 = jax.enable_x64

D = 1
HP_COV = HP     # alpha_eta=10, beta_eta=1 defaults match the prior draw


def _prior_draw_cov(key, X):
    """Prior draw including the covariate tower (references:
    UpdateEta.h:28-94 [eta ~ N(0, (tau_eta pen)^-1)], UpdateTau.h:75-95
    [tau_eta ~ Gamma(alpha_eta, beta_eta)], UpdateA.h:137-205 [A_xi],
    UpdateDelta.h:76-125 [delta_xi], UpdateGamma.h:48-73 [gamma_xi],
    UpdateXi.h:77-79 [xi ~ N(0, 1/(gamma_xi tilde_xi))])."""
    base = _prior_draw(key)
    ks = jax.random.split(jax.random.fold_in(key, 777), 8)
    dt = jnp.float64
    tau_eta = jax.random.gamma(ks[0], HP_COV.alpha_eta, (K, D), dt) \
        / HP_COV.beta_eta
    eta = jax.random.normal(ks[1], (K, P, D), dt) \
        / jnp.sqrt(tau_eta[:, None, :])
    a1 = jax.random.gamma(ks[2], HP_COV.alpha1l, (K, D), dt) / HP_COV.beta1l
    a2 = jax.random.gamma(ks[3], HP_COV.alpha2l, (K, D), dt) / HP_COV.beta2l
    A_xi = jnp.stack([a1, a2], axis=1)                        # (K, 2, D)
    d0 = jax.random.gamma(ks[4], a1, (K, D), dt)
    dm = jax.random.gamma(ks[5], a2[:, None, :].repeat(M - 1, 1),
                          (K, M - 1, D), dt)
    delta_xi = jnp.concatenate([d0[:, None, :], dm], axis=1)  # (K, M, D)
    gamma_xi = jax.random.gamma(ks[6], HP_COV.nu_1 / 2.0, (K, P, D, M), dt) \
        / (HP_COV.nu_1 / 2.0)
    tilde_xi = jnp.cumprod(delta_xi, axis=1)                  # (K, M, D)
    pri = tilde_xi.transpose(0, 2, 1)[:, None, :, :]          # (K,1,D,M)
    xi = jax.random.normal(ks[7], (K, P, D, M), dt) \
        / jnp.sqrt(gamma_xi * pri)
    return base.replace(eta=eta, tau_eta=tau_eta, xi=xi, gamma_xi=gamma_xi,
                        delta_xi=delta_xi, A_xi=A_xi)


def _draw_y_cov(key, st, X):
    w = effective_coeffs(st, X)
    return w + jnp.sqrt(st.sigma2) * jax.random.normal(key, w.shape, w.dtype)


def _stats_cov(st):
    tilde_xi = jnp.cumprod(st.delta_xi, axis=1)
    pri = tilde_xi.transpose(0, 2, 1)[:, None, :, :]
    return jnp.concatenate([_stats(st), jnp.stack([
        jnp.mean(st.eta ** 2 * st.tau_eta[:, None, :]),   # chi2_1 mean
        jnp.mean(st.gamma_xi * pri * st.xi ** 2),          # chi2_1 mean
        jnp.mean(jnp.log(st.delta_xi)),
        jnp.mean(jnp.log(st.gamma_xi)),
        jnp.mean(st.A_xi),
        jnp.mean(jnp.log(st.tau_eta)),
    ])])


STAT_NAMES_COV = STAT_NAMES + ["eta2_std", "xi2_std", "log_delta_xi",
                               "log_gamma_xi", "A_xi", "log_tau_eta"]


def _run_geweke(prior_fn, y_fn, stats_fn, sweep_kwargs, stat_names, X,
                n_mc=8000, n_sc=4000, n_chains=8, n_burn=500,
                chi2_stats=()):
    with enable_x64():
        data0 = make_multivariate_data(
            np.zeros((N, P)), X=np.asarray(X) if X is not None else None,
            dtype=jnp.float64)
        c = jnp.asarray(C_VEC, jnp.float64)

        @jax.jit
        def mc_stats(key):
            ks = jax.random.split(key, n_mc)
            return jax.lax.map(lambda k: stats_fn(prior_fn(k)), ks)

        def sc_run(key):
            st0 = prior_fn(jax.random.fold_in(key, 0))
            y0 = y_fn(jax.random.fold_in(key, 1), st0)

            def step(carry, k):
                st, y = carry
                k1, k2 = jax.random.split(k)
                d = data0.replace(y=y, u=y, yy=jnp.sum(y * y, axis=1))
                st = gibbs.sweep_full(k1, st, d, HP_COV, c, **sweep_kwargs)
                y = y_fn(k2, st)
                return (st, y), stats_fn(st)

            ks = jax.random.split(jax.random.fold_in(key, 2), n_sc)
            _, stats = jax.lax.scan(step, (st0, y0), ks)
            return stats

        mc = np.asarray(mc_stats(jax.random.PRNGKey(42)))
        sc = np.asarray(jax.jit(jax.vmap(sc_run))(
            jax.random.split(jax.random.PRNGKey(43), n_chains)))

    assert np.isfinite(mc).all() and np.isfinite(sc).all()
    sc = sc[:, n_burn:, :]
    failures = []
    for j, name in enumerate(stat_names):
        m1, v1 = mc[:, j].mean(), mc[:, j].var(ddof=1)
        chain_means = sc[:, :, j].mean(axis=1)
        m2 = chain_means.mean()
        se_sc = chain_means.std(ddof=1) / np.sqrt(n_chains)
        se = np.sqrt(v1 / mc.shape[0] + se_sc ** 2)
        z = (m1 - m2) / se
        if abs(z) > 5.0:
            failures.append(f"{name}: z={z:.2f} (mc={m1:.4f}, sc={m2:.4f}, "
                            f"se_sc={se_sc:.4f})")
    assert not failures, "Geweke z-score failures: " + "; ".join(failures)
    for j in chi2_stats:
        assert abs(mc[:, j].mean() - 1.0) < 0.1
        assert abs(sc[:, :, j].mean() - 1.0) < 0.15


@pytest.mark.slow
def test_geweke_covariate_adjusted_sweep():
    """D=1 MV sweep: eta/xi/delta_xi/gamma_xi/A_xi/tau_eta enter the joint
    invariance proof (round-2 VERDICT weak #5)."""
    rng = np.random.default_rng(5)
    X = rng.normal(size=(N, D))
    _run_geweke(
        lambda k: _prior_draw_cov(k, jnp.asarray(X)),
        lambda k, st: _draw_y_cov(k, st, jnp.asarray(X)),
        _stats_cov,
        dict(covariate_mean=True, covariate_cov=True),
        STAT_NAMES_COV, X,
        n_mc=8000, n_sc=3000, n_chains=8,
        chi2_stats=(2, 3, len(STAT_NAMES), len(STAT_NAMES) + 1))


@pytest.mark.slow
def test_geweke_collapsed_gauge_sweep():
    """The production sweep (collapsed (Z, chi) block + gauge MH moves +
    the round-4/5 interweaves + BOTH collapsed-Phi kernels: column MH and
    MALA) leaves the joint distribution invariant — the exactness proof
    for every non-reference kernel (ops/gibbs.py update_z_chi /
    update_gauge / update_mgp_scale / update_noise_scale / update_phi_chi
    / update_phi_mala)."""
    _run_geweke(
        _prior_draw, _draw_y, _stats,
        dict(collapsed_z=True, gauge=True, phi_chi_moves=2,
             phi_mala_steps=1, z_anchor=True, hmc_steps=2, hmc_eps=0.02),
        STAT_NAMES, None,
        n_mc=8000, n_sc=3000, n_chains=8, chi2_stats=(2, 3))
