"""Iterative NUTS (No-U-Turn Sampler) — static-shape, XLA-friendly.

Completes SURVEY.md §7 item 3 ("NUTS with dual-averaging + diagonal mass
adaptation, chain-vmapped") alongside the jittered-HMC default
(samplers/hmc.py).  Hoffman & Gelman's recursive tree doubling is replaced
by the *iterative* formulation (Phan & Pradhan, "Iterative NUTS"; the
scheme used by NumPyro): a subtree of 2^d leaves is built by a
`lax.while_loop` that detects every internal sub-subtree U-turn with a
checkpoint stack of size ``max_depth`` — no recursion, no dynamic shapes,
one compiled program regardless of tree size.

Algorithmic choices (all standard modern NUTS):
  * multinomial progressive sampling within and across subtrees
    (Betancourt's "biased progressive" scheme), not slice sampling;
  * generalized U-turn criterion on the momentum sum rho:
    stop when  v_left . rho <= 0  or  v_right . rho <= 0,
    v = M^{-1} p  (invariant under time reversal, so one subtree builder
    serves both directions);
  * divergence at energy error > 1000;
  * warmup = dual-averaging step size + Welford diagonal mass, reusing the
    two-phase schedule in samplers/hmc.py.

The reference has no gradient-based kernel at all (its sampler is
Gibbs-within-Metropolis, inst/include/BayesFMMM/BFMMM.h); this module is
part of the rebuild's "beyond the reference" whole-model path over
models/logjoint.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from bayesfmmm_tpu.samplers.hmc import AdaptState, _dual_avg_update

_MAX_DELTA_ENERGY = 1000.0


class _Tree(NamedTuple):
    """One NUTS trajectory tree (all leaves implicit; endpoints + stats)."""
    q_left: jnp.ndarray
    p_left: jnp.ndarray
    grad_left: jnp.ndarray
    q_right: jnp.ndarray
    p_right: jnp.ndarray
    grad_right: jnp.ndarray
    q_prop: jnp.ndarray        # multinomial proposal drawn from the tree
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_weight: jnp.ndarray    # log sum_leaves exp(H0 - H(leaf))
    p_sum: jnp.ndarray         # rho = sum of leaf momenta
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray    # sum of min(1, exp(H0 - H_leaf)) for adaptation
    n_leaves: jnp.ndarray


def _is_turning(inv_mass, p_first, p_last, rho):
    v_first = inv_mass * p_first
    v_last = inv_mass * p_last
    return (jnp.dot(v_first, rho) <= 0.0) | (jnp.dot(v_last, rho) <= 0.0)


def _build_subtree(key, vg, q0, p0, grad0, eps_signed, depth, inv_mass,
                   energy0, max_depth):
    """2^depth new leapfrog leaves starting one step past (q0, p0).

    Returns a _Tree whose left endpoint is the FIRST new leaf (closest to
    the main tree) and right endpoint the LAST (farthest), in trajectory
    order of this subtree's own direction.
    """
    dim = q0.shape[0]
    dtype = q0.dtype
    n_leaves = jnp.int32(1) << depth

    # checkpoint stack: slot k holds the starting momentum and the
    # momentum prefix-sum *before* the currently open level-k range
    ckpt_p = jnp.zeros((max_depth + 1, dim), dtype)
    ckpt_psum = jnp.zeros((max_depth + 1, dim), dtype)
    levels = jnp.arange(max_depth + 1)

    def leaf_energy(logp, p):
        return -logp + 0.5 * jnp.sum(inv_mass * p * p)

    def one_leapfrog(q, p, grad):
        p = p + 0.5 * eps_signed * grad
        q = q + eps_signed * inv_mass * p
        logp, grad = vg(q)
        p = p + 0.5 * eps_signed * grad
        return q, p, logp, grad

    init = dict(
        i=jnp.int32(0), q=q0, p=p0, grad=grad0,
        first_q=q0, first_p=p0, first_grad=grad0,
        q_prop=q0, logp_prop=jnp.array(-jnp.inf, dtype),
        grad_prop=grad0,
        log_weight=jnp.array(-jnp.inf, dtype),
        p_sum=jnp.zeros(dim, dtype),
        turning=jnp.bool_(False), diverging=jnp.bool_(False),
        sum_accept=jnp.array(0.0, dtype), n_done=jnp.int32(0),
        ckpt_p=ckpt_p, ckpt_psum=ckpt_psum, key=key)

    def cond(c):
        return (c["i"] < n_leaves) & ~c["turning"] & ~c["diverging"]

    def body(c):
        i = c["i"]
        q, p, logp, grad = one_leapfrog(c["q"], c["p"], c["grad"])

        # open level-k ranges starting at leaf i: i % 2^k == 0, 1 <= k <= depth.
        # Store leaf i's OWN momentum (post-leapfrog) and the prefix sum
        # *before* leaf i, so a range's rho includes its first leaf and the
        # U-turn velocity is that first leaf's — the time-reversible
        # criterion (same bookkeeping as NumPyro's iterative scheme).
        opens = (jnp.bitwise_and(i, (jnp.int32(1) << levels) - 1) == 0) \
            & (levels >= 1) & (levels <= depth)
        ckpt_p_new = jnp.where(opens[:, None], p[None, :], c["ckpt_p"])
        ckpt_psum_new = jnp.where(opens[:, None], c["p_sum"][None, :],
                                  c["ckpt_psum"])
        energy = leaf_energy(logp, p)
        delta = energy - energy0
        diverging = ~jnp.isfinite(delta) | (delta > _MAX_DELTA_ENERGY)
        lw_leaf = jnp.where(diverging, -jnp.inf, -delta)

        # progressive multinomial sampling within the subtree
        log_weight = jnp.logaddexp(c["log_weight"], lw_leaf)
        key, ku = jax.random.split(c["key"])
        take = jnp.log(jax.random.uniform(ku)) < (lw_leaf - log_weight)
        q_prop = jnp.where(take, q, c["q_prop"])
        logp_prop = jnp.where(take, logp, c["logp_prop"])
        grad_prop = jnp.where(take, grad, c["grad_prop"])

        p_sum = c["p_sum"] + p
        first_q = jnp.where(i == 0, q, c["first_q"])
        first_p = jnp.where(i == 0, p, c["first_p"])
        first_grad = jnp.where(i == 0, grad, c["first_grad"])

        # close level-k ranges ending at leaf i: (i+1) % 2^k == 0
        closes = (jnp.bitwise_and(i + 1, (jnp.int32(1) << levels) - 1) == 0) \
            & (levels >= 1) & (levels <= depth)
        rho_k = p_sum[None, :] - ckpt_psum_new           # (max_depth+1, dim)
        turn_k = (jnp.einsum("kd,kd->k", inv_mass[None, :] * ckpt_p_new,
                             rho_k) <= 0.0) | \
                 (jnp.einsum("d,kd->k", inv_mass * p, rho_k) <= 0.0)
        turning = jnp.any(closes & turn_k)

        alpha = jnp.minimum(1.0, jnp.exp(-delta))
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)

        return dict(
            i=i + 1, q=q, p=p, grad=grad,
            first_q=first_q, first_p=first_p, first_grad=first_grad,
            q_prop=q_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_weight=log_weight, p_sum=p_sum,
            turning=turning, diverging=diverging,
            sum_accept=c["sum_accept"] + alpha, n_done=c["n_done"] + 1,
            ckpt_p=ckpt_p_new, ckpt_psum=ckpt_psum_new, key=key)

    c = jax.lax.while_loop(cond, body, init)
    return _Tree(
        q_left=c["first_q"], p_left=c["first_p"], grad_left=c["first_grad"],
        q_right=c["q"], p_right=c["p"], grad_right=c["grad"],
        q_prop=c["q_prop"], logp_prop=c["logp_prop"],
        grad_prop=c["grad_prop"],
        log_weight=c["log_weight"], p_sum=c["p_sum"],
        turning=c["turning"], diverging=c["diverging"],
        sum_accept=c["sum_accept"], n_leaves=c["n_done"])


def nuts_kernel(log_joint_flat, max_depth=8):
    """Returns step(key, (q, logp, grad), eps, inv_mass) ->
    ((q, logp, grad), info dict)."""
    vg = jax.value_and_grad(log_joint_flat)

    def step(key, state, eps, inv_mass):
        q0, logp0, grad0 = state
        kp, kd, kt = jax.random.split(key, 3)
        p0 = jax.random.normal(kp, q0.shape, q0.dtype) / jnp.sqrt(inv_mass)
        energy0 = -logp0 + 0.5 * jnp.sum(inv_mass * p0 * p0)

        tree0 = _Tree(
            q_left=q0, p_left=p0, grad_left=grad0,
            q_right=q0, p_right=p0, grad_right=grad0,
            q_prop=q0, logp_prop=logp0, grad_prop=grad0,
            log_weight=jnp.array(0.0, q0.dtype), p_sum=p0,
            turning=jnp.bool_(False), diverging=jnp.bool_(False),
            sum_accept=jnp.array(0.0, q0.dtype), n_leaves=jnp.int32(1))

        def cond(carry):
            depth, tree, _ = carry
            return (depth < max_depth) & ~tree.turning & ~tree.diverging

        def body(carry):
            depth, tree, key = carry
            key, kdir, ksub, kacc = jax.random.split(key, 4)
            go_right = jax.random.bernoulli(kdir)
            q_e = jnp.where(go_right, tree.q_right, tree.q_left)
            p_e = jnp.where(go_right, tree.p_right, tree.p_left)
            g_e = jnp.where(go_right, tree.grad_right, tree.grad_left)
            sub = _build_subtree(ksub, vg, q_e, p_e, g_e,
                                 jnp.where(go_right, eps, -eps), depth,
                                 inv_mass, energy0, max_depth)

            ok = ~sub.turning & ~sub.diverging
            # biased progressive sampling across the doubling
            p_take = jnp.exp(jnp.minimum(0.0, sub.log_weight
                                         - tree.log_weight))
            take = ok & (jax.random.uniform(kacc) < p_take)
            q_prop = jnp.where(take, sub.q_prop, tree.q_prop)
            logp_prop = jnp.where(take, sub.logp_prop, tree.logp_prop)
            grad_prop = jnp.where(take, sub.grad_prop, tree.grad_prop)

            # merge endpoints / rho only when the doubling is kept
            new_right = ok & go_right
            new_left = ok & ~go_right
            merged = _Tree(
                q_left=jnp.where(new_left, sub.q_right, tree.q_left),
                p_left=jnp.where(new_left, sub.p_right, tree.p_left),
                grad_left=jnp.where(new_left, sub.grad_right,
                                    tree.grad_left),
                q_right=jnp.where(new_right, sub.q_right, tree.q_right),
                p_right=jnp.where(new_right, sub.p_right, tree.p_right),
                grad_right=jnp.where(new_right, sub.grad_right,
                                     tree.grad_right),
                q_prop=q_prop, logp_prop=logp_prop, grad_prop=grad_prop,
                log_weight=jnp.logaddexp(tree.log_weight,
                                         jnp.where(ok, sub.log_weight,
                                                   -jnp.inf)),
                p_sum=tree.p_sum + jnp.where(ok, sub.p_sum, 0.0),
                turning=jnp.bool_(False), diverging=sub.diverging,
                sum_accept=tree.sum_accept + sub.sum_accept,
                n_leaves=tree.n_leaves + sub.n_leaves)
            full_turn = _is_turning(inv_mass, merged.p_left, merged.p_right,
                                    merged.p_sum)
            merged = merged._replace(
                turning=sub.turning | (ok & full_turn))
            return depth + 1, merged, key

        depth, tree, _ = jax.lax.while_loop(cond, body,
                                            (jnp.int32(0), tree0, kt))
        new_state = (tree.q_prop, tree.logp_prop, tree.grad_prop)
        accept_stat = tree.sum_accept / jnp.maximum(
            tree.n_leaves.astype(q0.dtype) - 1.0, 1.0)
        info = {"accept_p": accept_stat, "depth": depth,
                "n_leaves": tree.n_leaves, "diverging": tree.diverging}
        return new_state, info

    return step


def run_nuts(key, log_joint, init_positions, *, n_warmup=500, n_samples=500,
             max_depth=8, target_accept=0.8, init_step_size=0.01):
    """Run vmapped NUTS chains with the same two-phase warmup as run_hmc.

    init_positions: pytree batch (leading chains axis).
    Returns (positions_trace pytree (chains, n_samples, ...), diagnostics).
    """
    if n_warmup < 4:
        raise ValueError("'n_warmup' must be an integer >= 4 (two adaptation "
                         "phases need at least 2 steps each)")
    n_warm1 = n_warmup // 2
    n_warm2 = n_warmup - n_warm1
    flat0, unravel = ravel_pytree(
        jax.tree.map(lambda x: x[0], init_positions))
    n_chains = jax.tree.leaves(init_positions)[0].shape[0]

    def log_joint_flat(q):
        return log_joint(unravel(q))

    step = nuts_kernel(log_joint_flat, max_depth=max_depth)
    vg = jax.value_and_grad(log_joint_flat)
    dim = flat0.shape[0]

    def chain(key, init_flat):
        logp0, grad0 = vg(init_flat)
        st = (init_flat, logp0, grad0)
        mu = jnp.log(10.0 * init_step_size)
        ad = AdaptState(jnp.log(init_step_size), jnp.log(init_step_size),
                        0.0, 0.0, jnp.zeros(dim), jnp.zeros(dim), 0.0)
        inv_mass = jnp.ones(dim)

        def warm1(carry, k):
            st, ad = carry
            st, info = step(k, st, jnp.exp(ad.log_eps), inv_mass)
            ad = _dual_avg_update(ad, info["accept_p"], target_accept, mu=mu)
            upd = ad.step > n_warmup // 4
            delta = st[0] - ad.mean
            cnt = ad.count + jnp.where(upd, 1.0, 0.0)
            mean = ad.mean + jnp.where(upd, delta / jnp.maximum(cnt, 1.0),
                                       0.0)
            m2 = ad.m2 + jnp.where(upd, delta * (st[0] - mean), 0.0)
            ad = ad._replace(mean=mean, m2=m2, count=cnt)
            return (st, ad), info["accept_p"]

        keys1 = jax.random.split(key, n_warm1)
        (st, ad), _ = jax.lax.scan(warm1, (st, ad), keys1)

        var = ad.m2 / jnp.maximum(ad.count - 1.0, 1.0)
        inv_mass2 = jnp.where(var > 1e-8, var, 1.0)

        ad2 = AdaptState(ad.log_eps_avg, ad.log_eps_avg, 0.0, 0.0,
                         jnp.zeros(dim), jnp.zeros(dim), 0.0)
        mu2 = ad.log_eps_avg + jnp.log(10.0)

        def warm2(carry, k):
            st, ad = carry
            st, info = step(k, st, jnp.exp(ad.log_eps), inv_mass2)
            ad = _dual_avg_update(ad, info["accept_p"], target_accept,
                                  mu=mu2)
            return (st, ad), info["accept_p"]

        keys2 = jax.random.split(jax.random.fold_in(key, 1), n_warm2)
        (st, ad2), aps2 = jax.lax.scan(warm2, (st, ad2), keys2)
        eps_final = jnp.exp(ad2.log_eps_avg)

        def sample(carry, k):
            st = carry
            st, info = step(k, st, eps_final, inv_mass2)
            return st, (st[0], info["accept_p"], info["depth"],
                        info["diverging"])

        keys3 = jax.random.split(jax.random.fold_in(key, 2), n_samples)
        st, (qs, aps, depths, divs) = jax.lax.scan(sample, st, keys3)
        return qs, {"accept_mean": aps.mean(), "eps": eps_final,
                    "warm_accept": aps2.mean(),
                    "mean_depth": depths.astype(qs.dtype).mean(),
                    "n_divergent": divs.sum()}

    keys = jax.random.split(key, n_chains)
    flats = jnp.stack([
        ravel_pytree(jax.tree.map(lambda x: x[i], init_positions))[0]
        for i in range(n_chains)])
    qs, diag = jax.jit(jax.vmap(chain))(keys, flats)
    unc_trace = jax.vmap(jax.vmap(unravel))(qs)
    return unc_trace, diag
