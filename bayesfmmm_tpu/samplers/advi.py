"""ADVI: mean-field Gaussian variational inference on the unconstrained space.

The rebuild's fast initializer (SURVEY.md §7): replaces the *role* of the
reference's phase-1/phase-2 restart pipeline (find a high-probability region
cheaply) with a few hundred Adam steps on the ELBO, after which Gibbs / HMC /
PT / SMC start from the variational mean (or samples).

Reparameterized ELBO with n_mc Monte-Carlo samples; entropy of the
mean-field Gaussian is closed-form.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class ADVIResult(NamedTuple):
    mean: object           # UncState pytree
    log_sd_flat: jnp.ndarray
    elbo_trace: jnp.ndarray
    unravel: object


def run_advi(key, log_joint, init_unc, *, n_steps=500, n_mc=4,
             learning_rate=0.02, init_log_sd=-2.0):
    """Optimize a mean-field Gaussian q; returns means + elbo trace."""
    flat0, unravel = ravel_pytree(init_unc)
    dim = flat0.shape[0]

    def lj_flat(q):
        return log_joint(unravel(q))

    params = {"mu": flat0, "log_sd": jnp.full((dim,), init_log_sd)}
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def neg_elbo(params, key):
        eps = jax.random.normal(key, (n_mc, dim))
        qs = params["mu"] + jnp.exp(params["log_sd"]) * eps
        lps = jax.vmap(lj_flat)(qs)
        entropy = jnp.sum(params["log_sd"]) \
            + 0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
        return -(lps.mean() + entropy)

    @jax.jit
    def step(params, opt_state, key):
        loss, g = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, -loss

    elbos = []
    for i in range(n_steps):
        params, opt_state, elbo = step(params, opt_state,
                                       jax.random.fold_in(key, i))
        elbos.append(elbo)
    return ADVIResult(unravel(params["mu"]), params["log_sd"],
                      jnp.stack(elbos), unravel)


def sample_from_advi(key, result: ADVIResult, n_samples=1):
    flat_mu, _ = ravel_pytree(result.mean)
    eps = jax.random.normal(key, (n_samples, flat_mu.shape[0]))
    qs = flat_mu + jnp.exp(result.log_sd_flat) * eps
    return jax.vmap(result.unravel)(qs)
