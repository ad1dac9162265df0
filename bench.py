"""Benchmark: ESS/s of the TPU Gibbs sampler vs a single-thread CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": N}

Config matches BASELINE.json's headline metric ("ESS/s per chip on the
functional MM, K=3 P=8").  The baseline denominator is *measured* each run
(BASELINE.md: the reference publishes no numbers): the same sweep in
vectorized single-thread NumPy (benchmarks/numpy_baseline.py), which is a
stronger baseline than the reference's scalar-loop Rcpp sampler.

ESS is computed per chain on *identifiable* quantities (fitted mean curves
at probe points + log-likelihood) and summed over chains — pooling raw
feature parameters across chains sitting in different label modes would
understate ESS; identifiable functionals are label-invariant.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")          # keep baseline 1-thread
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bayesfmmm_tpu.config import ModelConfig, Priors
    from bayesfmmm_tpu.diagnostics import effective_sample_size
    from bayesfmmm_tpu.models.likelihood import log_likelihood
    from bayesfmmm_tpu.ops import gibbs
    from bayesfmmm_tpu.ops.mean import compute_mu
    from bayesfmmm_tpu.models.state import init_state
    from bayesfmmm_tpu.utils.simulate import simulate_functional

    K, P, M, N = 3, 8, 4, 100
    N_CHAINS = 64
    N_ITERS = 300
    data, _ = simulate_functional(seed=7, N=N, K=K, P=P, M=M,
                                  n_time=(100, 100))
    hp = Priors()
    c = jnp.full((K,), 10.0)
    cfg = ModelConfig(K=K, P=P, M=M)

    key = jax.random.PRNGKey(0)
    chain_keys = jax.random.split(key, N_CHAINS)
    states = jax.jit(jax.vmap(lambda k: init_state(k, cfg, data)))(chain_keys)

    # identifiable probes: fitted values for 8 observations at 4 time points
    probe_obs = jnp.arange(0, N, N // 8)[:8]
    probe_t = jnp.arange(0, data.L, data.L // 4)[:4]

    def one_chain(k, st):
        def body(carry, kk):
            st = gibbs.sweep_full(kk, carry, data, hp, c)
            mu = compute_mu(data, st)
            probes = mu[probe_obs][:, probe_t].ravel()
            ll = log_likelihood(st, data)
            return st, jnp.concatenate([probes, ll[None]])
        keys = jax.random.split(k, N_ITERS)
        return jax.lax.scan(body, st, keys)

    run = jax.jit(jax.vmap(one_chain))

    # compile
    t0 = time.time()
    final, out = run(chain_keys, states)
    jax.block_until_ready(out)
    compile_and_run = time.time() - t0

    # timed run
    chain_keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(chain_keys)
    t0 = time.time()
    final, out = run(chain_keys2, final)
    jax.block_until_ready(out)
    elapsed = time.time() - t0

    out = np.asarray(out)                      # (chains, iters, n_q)
    warm = N_ITERS // 3
    tail = out[:, warm:]
    n_q = tail.shape[2]
    # per-chain ESS per quantity, median over quantities, summed over chains
    ess_chain = np.zeros(N_CHAINS)
    for ci in range(N_CHAINS):
        vals = [effective_sample_size(tail[ci, :, j][None, :])
                for j in range(n_q)]
        ess_chain[ci] = float(np.median(vals))
    ess_total = float(ess_chain.sum())
    tpu_ess_per_sec = ess_total / elapsed * (N_ITERS / (N_ITERS - warm))
    tpu_iters_per_sec = N_CHAINS * N_ITERS / elapsed

    # ---- CPU single-thread baseline (measured) ----
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    from numpy_baseline import NumpyGibbs

    hp_np = dict(a_Z_PM=hp.a_Z_PM, alpha_nu=hp.alpha_nu, beta_nu=hp.beta_nu,
                 alpha_0=hp.alpha_0, beta_0=hp.beta_0, nu_1=hp.nu_1)
    base = NumpyGibbs(np.asarray(data.y), np.asarray(data.mask),
                      np.asarray(data.B), np.asarray(data.pen), K, M, hp_np)
    s = base.init_state()
    base.sweep(s)  # warm numpy caches
    n_base = 15
    t0 = time.time()
    for _ in range(n_base):
        base.sweep(s)
    base_elapsed = time.time() - t0
    base_iters_per_sec = n_base / base_elapsed
    # identical algorithm => same ESS/iteration; one baseline chain
    ess_per_iter_chain = float(np.mean(ess_chain)) / (N_ITERS - warm)
    base_ess_per_sec = ess_per_iter_chain * base_iters_per_sec

    result = {
        "metric": "ess_per_sec_functional_K3_P8_N100_64chains",
        "value": round(tpu_ess_per_sec, 2),
        "unit": "ESS/s",
        "vs_baseline": round(tpu_ess_per_sec / base_ess_per_sec, 2),
        "detail": {
            "backend": jax.default_backend(),
            "tpu_iters_per_sec": round(tpu_iters_per_sec, 1),
            "baseline_iters_per_sec": round(base_iters_per_sec, 2),
            "ess_total_identifiable": round(ess_total, 1),
            "ess_per_chain_mean": round(float(np.mean(ess_chain)), 2),
            "compile_s": round(compile_and_run - elapsed, 1),
            "timed_s": round(elapsed, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
