"""Legacy binary (overlapping-clustering) membership kernels.

Reference: UpdateClassMembership.h (545 LoC) and the conjugate Beta pi
update (UpdatePi.h:17-29) — the 0/1-membership ancestor of the mixed
membership model.  In the reference these are dead code (only reachable
from the unexported BFMMM/BFMMM_Templadder drivers and the commented-out
Test.cpp; SURVEY.md §2 row 7), but they are part of the component inventory,
so the rebuild carries vectorized equivalents:

  * ``update_z_binary`` — per-observation MH with independent Bernoulli
    flip proposals at stickiness rho (UpdateClassMembership.h:127-132);
    target = Bernoulli(pi) prior x Gaussian likelihood with beta tempering
    (lpdf_z, :29-48; tempered :234).
  * ``update_pi_binary`` — conjugate Beta draw
    pi_l ~ Beta(alpha/K + sum_i Z_il, N - sum_i Z_il + 1) (UpdatePi.h:17-29).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bayesfmmm_tpu.ops.mean import feature_offsets

_HI = dict(precision="highest")


def update_z_binary(key, state, data, rho=0.9, beta=1.0):
    """MH sweep over all rows with Bernoulli flip proposals.

    Returns the state with a new 0/1-valued Z.  All rows are conditionally
    independent, so the reference's sequential i-loop vectorizes.
    """
    T = feature_offsets(state, data.X)                     # (N, K, P)
    C = jnp.einsum("nlp,nkp->nlk", data.B, T, **_HI)       # (N, L, K)

    def row_lpdf(Z):
        mu = jnp.einsum("nk,nlk->nl", Z, C, **_HI)
        r = data.y - mu
        lik = -beta * jnp.sum(r * r, axis=1) / (2.0 * state.sigma2)
        prior = jnp.sum(Z * jnp.log(state.pi)
                        + (1.0 - Z) * jnp.log1p(-state.pi), axis=1)
        return lik + prior

    kp, ka = jax.random.split(key)
    # propose: keep each bit with prob rho (flip with 1 - rho)
    keep_prob = state.Z * rho + (1.0 - state.Z) * (1.0 - rho)
    Z_new = jax.random.bernoulli(kp, keep_prob).astype(state.Z.dtype)
    log_acc = row_lpdf(Z_new) - row_lpdf(state.Z)
    u = jax.random.uniform(ka, (data.N,))
    accept = jnp.log(u) < log_acc
    Z = jnp.where(accept[:, None], Z_new, state.Z)
    return state.replace(Z=Z)


def update_pi_binary(key, state, alpha=1.0):
    """Conjugate Beta update for binary memberships (UpdatePi.h:17-29)."""
    N, K = state.Z.shape
    counts = jnp.sum(state.Z, axis=0)
    a = alpha / K + counts
    b = N - counts + 1.0
    pi = jax.random.beta(key, a, b)
    return state.replace(pi=pi)
