"""ESS/s lines for the PT and SMC samplers (round-2 VERDICT #9).

Prints one JSON line per sampler in the bench.py schema.  PT reports the
cold chain's rank-normalized ESS/s over rounds (replica sweeps are the
cost: R sweeps per cold draw); SMC reports the weight-ESS of the final
particle cloud over total wall time plus the log-evidence estimate (a
capability the Gibbs/reference path does not have at all).

Usage: python benchmarks/bench_samplers.py [--which pt,smc]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _setup():
    import jax
    import jax.numpy as jnp
    from bayesfmmm_tpu.config import ModelConfig, Priors
    from bayesfmmm_tpu.models.state import init_state
    from bayesfmmm_tpu.utils.init_strategies import spectral_init
    from bayesfmmm_tpu.utils.simulate import simulate_functional

    K, P, M, N = 3, 8, 4, 100
    data, _ = simulate_functional(seed=7, N=N, K=K, P=P, M=M,
                                  n_time=(100, 100))
    hp = Priors()
    c = jnp.full((K,), 10.0)
    cfg = ModelConfig(K=K, P=P, M=M)
    sp = spectral_init(data, K, M)
    spj = {k: jnp.asarray(v, data.y.dtype) for k, v in sp.items()}

    def seed(k):
        st = init_state(k, cfg, data)
        jz = 0.02 * jax.random.normal(k, spj["Z"].shape, data.y.dtype)
        Z0 = jnp.clip(spj["Z"] + jz, 1e-4, None)
        return st.replace(Z=Z0 / jnp.sum(Z0, axis=1, keepdims=True),
                          nu=spj["nu"], chi=spj["chi"], Phi=spj["Phi"],
                          sigma2=spj["sigma2"])

    return data, hp, c, cfg, seed


def bench_pt(n_replicas=8, n_rounds=1500, warm_rounds=500):
    import jax
    import jax.numpy as jnp
    from bayesfmmm_tpu.diagnostics import rank_normalized_ess
    from bayesfmmm_tpu.models.likelihood import log_likelihood
    from bayesfmmm_tpu.ops.mean import compute_mu
    from bayesfmmm_tpu.parallel import tempering

    data, hp, c, cfg, seed = _setup()
    keys = jax.random.split(jax.random.PRNGKey(1), n_replicas)
    replicas = jax.jit(jax.vmap(seed))(keys)
    ladder = tempering.geometric_ladder(n_replicas, 0.3).astype(data.y.dtype)
    probe_obs = jnp.arange(0, data.N, data.N // 8)[:8]
    probe_t = jnp.arange(0, data.L, data.L // 4)[:4]

    def rounds(key, pt, n, record):
        def rd(carry, inp):
            pt, = carry
            i, k = inp
            pt = tempering.pt_step(k, pt, data, hp, c, ladder, parity=i % 2)
            if record:
                cold = jax.tree.map(lambda x: x[0], pt.states)
                mu = compute_mu(data, cold)
                o = jnp.concatenate([mu[probe_obs][:, probe_t].ravel(),
                                     log_likelihood(cold, data)[None]])
            else:
                o = None
            return (pt,), o
        ks = jax.random.split(key, n)
        (pt,), out = jax.lax.scan(rd, (pt,), (jnp.arange(n), ks))
        return pt, out

    pt0 = tempering.pt_init(replicas)
    warm = jax.jit(lambda k, p: rounds(k, p, warm_rounds, False)[0])
    meas = jax.jit(lambda k, p: rounds(k, p, n_rounds, True))
    t0 = time.time()
    pt = warm(jax.random.PRNGKey(2), pt0)
    jax.block_until_ready(pt.states.Z)
    warm_s = time.time() - t0
    t0 = time.time()
    pt, out = meas(jax.random.PRNGKey(3), pt)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    out = np.asarray(out)[None]               # one cold chain
    ess_q = [rank_normalized_ess(out[:, :, j]) for j in range(out.shape[2])]
    ess = float(np.median(ess_q))
    rate = float(pt.swap_accepts / np.maximum(float(pt.swap_attempts), 1.0))
    return {
        "metric": "pt_cold_chain_ess_per_sec_functional_K3_P8",
        "value": round(ess / elapsed, 2), "unit": "ESS/s",
        "detail": {"replicas": n_replicas, "rounds": n_rounds,
                   "swap_rate": round(rate, 3),
                   "cold_ess": round(ess, 1), "warm_s": round(warm_s, 1),
                   "timed_s": round(elapsed, 2),
                   "replica_sweeps_per_sec": round(
                       n_replicas * n_rounds / elapsed, 1)}}


def bench_smc(n_particles=256):
    import jax
    import jax.numpy as jnp
    from bayesfmmm_tpu.samplers.smc import ess_from_log_weights, run_smc

    data, hp, c, cfg, seed = _setup()
    from bayesfmmm_tpu.models.state import init_state
    keys = jax.random.split(jax.random.PRNGKey(4), n_particles)
    particles = jax.jit(jax.vmap(
        lambda k: init_state(k, cfg, data)))(keys)
    run = jax.jit(lambda k, p: run_smc(k, p, data, hp, c,
                                       n_mutation_sweeps=2))
    t0 = time.time()
    res = run(jax.random.PRNGKey(5), particles)
    jax.block_until_ready(res.log_weights)
    elapsed = time.time() - t0
    wess = float(ess_from_log_weights(res.log_weights))
    return {
        "metric": "smc_weight_ess_per_sec_functional_K3_P8",
        "value": round(wess / elapsed, 2), "unit": "ESS/s",
        "detail": {"particles": n_particles,
                   "stages": int(res.n_stages),
                   "final_beta": float(res.final_beta),
                   "log_evidence": round(float(res.log_evidence), 1),
                   "weight_ess": round(wess, 1),
                   "timed_s": round(elapsed, 2)}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="pt,smc")
    args = ap.parse_args()
    for w in args.which.split(","):
        res = bench_pt() if w == "pt" else bench_smc()
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
