"""Tempered Sequential Monte Carlo over the mixed membership posterior.

SMC is the rebuild's second answer (with parallel tempering) to the
multimodal Z posterior the reference attacks with tempered transitions
(SURVEY.md §7).  Scheme: anneal the likelihood from beta=0 (prior) to
beta=1 through an adaptive schedule; at each stage

  1. reweight particles by (beta_new - beta_old) * loglik,
  2. resample systematically when ESS < threshold,
  3. mutate every particle with the tempered Gibbs sweep (ops/gibbs.py)
     at the current beta — a perfectly posterior-invariant mutation kernel.

Particles are a vmapped batch (the mesh `chains` axis shards them; the
weight normalization and ESS are the only cross-particle reductions and
lower to psum/all-gather).  Adaptive beta chooses the next temperature by
bisection on the relative conditional ESS (standard adaptive tempering).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayesfmmm_tpu.ops import gibbs


def _loglik(state, data):
    from bayesfmmm_tpu.ops.mean import effective_coeffs, rss_from_coeffs
    rss = rss_from_coeffs(data, effective_coeffs(state, data.X))
    n = jnp.sum(data.mask)
    return -0.5 * n * (jnp.log(2 * jnp.pi) + jnp.log(state.sigma2)) \
        - rss / (2.0 * state.sigma2)


def systematic_resample(key, log_weights):
    """Systematic resampling; returns ancestor indices (N,)."""
    N = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    positions = (jax.random.uniform(key) + jnp.arange(N)) / N
    cum = jnp.cumsum(w)
    return jnp.searchsorted(cum, positions)


def ess_from_log_weights(log_w):
    w = jax.nn.softmax(log_w)
    return 1.0 / jnp.sum(w * w)


def _next_beta(beta, logliks, target_frac, n_particles):
    """Bisect for the largest beta' <= 1 whose incremental weights keep
    relative conditional ESS >= target_frac."""
    def cess(b_new):
        lw = (b_new - beta) * logliks
        return ess_from_log_weights(lw) / n_particles

    def cond(carry):
        lo, hi, it = carry
        return (it < 30) & (hi - lo > 1e-5)

    def body(carry):
        lo, hi, it = carry
        mid = 0.5 * (lo + hi)
        ok = cess(mid) >= target_frac
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1

    ok_full = cess(1.0) >= target_frac
    lo, hi, _ = jax.lax.while_loop(cond, body, (beta, 1.0, 0))
    return jnp.where(ok_full, 1.0, lo)


class SMCResult(NamedTuple):
    particles: object
    log_weights: jnp.ndarray
    n_stages: jnp.ndarray
    log_evidence: jnp.ndarray
    final_beta: jnp.ndarray


def run_smc(key, init_particles, data, hp, c, *, n_mutation_sweeps=2,
            target_cess=0.7, ess_threshold=0.5, max_stages=200,
            covariate_mean=False, covariate_cov=False,
            collapsed_z=False, gauge=False):
    """Adaptive tempered SMC.  init_particles: particle-stacked GibbsState."""
    N = jax.tree.leaves(init_particles)[0].shape[0]
    loglik_v = jax.vmap(lambda s: _loglik(s, data))

    def mutate(key, particles, beta):
        def one(k, st):
            def body(s, kk):
                return gibbs.sweep_full(kk, s, data, hp, c,
                                        covariate_mean=covariate_mean,
                                        covariate_cov=covariate_cov,
                                        beta=beta, collapsed_z=collapsed_z,
                                        gauge=gauge), None
            ks = jax.random.split(k, n_mutation_sweeps)
            st, _ = jax.lax.scan(body, st, ks)
            return st
        return jax.vmap(one)(jax.random.split(key, N), particles)

    def stage(carry):
        particles, log_w, beta, log_Z, it, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        ll = loglik_v(particles)
        beta_new = _next_beta(beta, ll, target_cess, N)
        inc = (beta_new - beta) * ll
        # evidence increment: log mean exp of incremental weights under
        # current normalized weights
        w = jax.nn.softmax(log_w)
        log_Z = log_Z + jax.scipy.special.logsumexp(jnp.log(w) + inc)
        log_w = log_w + inc
        # resample if depleted
        ess = ess_from_log_weights(log_w)
        do_res = ess < ess_threshold * N
        anc = systematic_resample(k1, log_w)
        particles = jax.lax.cond(
            do_res,
            lambda p: jax.tree.map(lambda x: x[anc], p),
            lambda p: p, particles)
        log_w = jnp.where(do_res, jnp.zeros_like(log_w), log_w)
        particles = mutate(k2, particles, beta_new)
        return particles, log_w, beta_new, log_Z, it + 1, key

    def cond(carry):
        _, _, beta, _, it, _ = carry
        return (beta < 1.0) & (it < max_stages)

    log_w0 = jnp.zeros((N,))
    particles, log_w, beta, log_Z, it, key = jax.lax.while_loop(
        cond, stage, (init_particles, log_w0, jnp.asarray(0.0),
                      jnp.asarray(0.0), jnp.asarray(0), key))
    return SMCResult(particles, log_w, it, log_Z, beta)
