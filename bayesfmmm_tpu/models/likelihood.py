"""Model log-likelihood and pointwise densities.

Reference: CalculateLikelihood.h — calcLikelihood (:19-44), calcLikelihoodMV
(:137-159), CovAdj (:254-327), pointwise DIC densities (:59-125, :172-238),
and the chi-integrated observation-level marginal used by CPO (:344-386).
All variants collapse here into masked batched forms over the unified data
representation (see models/state.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from bayesfmmm_tpu.ops.mean import (compute_mu, effective_coeffs,
                                    rss_from_coeffs)

_LOG_2PI = 1.8378770664093453


def model_mean(state, data):
    """Full model mean mu[n, l] (zero at padded points)."""
    return compute_mu(data, state)


def log_likelihood(state, data):
    """Total Gaussian log likelihood (calcLikelihood, :19-44); the RSS is
    evaluated in residual space (ops/mean.py:rss_from_coeffs) — the Gram
    identity cancels catastrophically in f32."""
    rss = rss_from_coeffs(data, effective_coeffs(state, data.X))
    n = jnp.sum(data.mask)
    return (-0.5 * n * (_LOG_2PI + jnp.log(state.sigma2))
            - 0.5 * rss / state.sigma2)


def pointwise_log_density(state, data):
    """(N, L) masked pointwise Gaussian log densities (DIC2 inputs)."""
    mu = model_mean(state, data)
    r = data.y - mu
    ll = -0.5 * (_LOG_2PI + jnp.log(state.sigma2)) - 0.5 * r * r / state.sigma2
    return ll * data.mask


def marginal_covariance(state, data, i):
    """chi-integrated observation covariance for observation i.

    Reference CPO assembly (CalculateLikelihood.h:361-372):
      cov_i = sum_{k,k'} Z_ik Z_ik' sum_m B_i (phi_km + xi_km x_i)
              (phi_k'm + xi_k'm x_i)' B_i' + sigma2 I.
    Returns (L, L) dense covariance on the padded grid (rows/cols beyond the
    mask are only sigma2 on the diagonal).
    """
    Bi = data.B[i]                       # (L, P)
    xi_eff = state.Phi + jnp.einsum("kpdm,d->kpm", state.xi, data.X[i])
    # u[m, l] = sum_k Z_ik B_i phi^eff_km
    u = jnp.einsum("k,lp,kpm->ml", state.Z[i], Bi, xi_eff)
    cov = jnp.einsum("ml,mo->lo", u, u)
    return cov + state.sigma2 * jnp.eye(Bi.shape[0], dtype=cov.dtype)


def observation_marginal_loglik(state, data, i):
    """log N(y_i | mean_i, cov_i) with chi integrated out (CPO integrand)."""
    mu_mean = jnp.einsum(
        "k,lp,kp->l", state.Z[i], data.B[i],
        state.nu + jnp.einsum("kpd,d->kp", state.eta, data.X[i]))
    cov = marginal_covariance(state, data, i)
    m = data.mask[i]
    # Mask padded points by pinning them to standard normal independent dims.
    r = (data.y[i] - mu_mean) * m
    cov = cov * (m[:, None] * m[None, :]) \
        + jnp.diag(jnp.where(m > 0, 0.0, 1.0))
    sign, logdet = jnp.linalg.slogdet(cov)
    sol = jnp.linalg.solve(cov, r)
    n_i = jnp.sum(m)
    return -0.5 * (n_i * _LOG_2PI + logdet + jnp.dot(r, sol))
