"""Benchmark: ESS/s of the TPU Gibbs sampler vs a single-thread CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": N}

Config matches BASELINE.json's headline metric ("ESS/s per chip on the
functional MM, K=3 P=8") at the reference's own SNR regime (the shipped
example's sigma2 ~ 0.003; ours 0.01).  The baseline denominator is
*measured* each run (BASELINE.md: the reference publishes no numbers): the
same sweep in vectorized single-thread NumPy (benchmarks/numpy_baseline.py),
a stronger baseline than the reference's scalar-loop Rcpp sampler.

Protocol (round-3; see BENCH_SUITE.md "operating point" study):
  * ESS is the MULTI-CHAIN rank-normalized estimator on identifiable
    quantities (fitted curves at probe points + loglik) — between-chain
    disagreement penalizes the total; label switching cannot deflate it.
  * This posterior has a measured O(1e5)-sweep equilibration transient
    (single-chain loglik still climbing at 30k sweeps) plus near-flat
    convex-hull gauge ridges.  The bench therefore runs an ANNEALED WARMUP
    (beta 0.2 -> 1 over 5k sweeps, then plain sweeps; gauge moves mix the
    ridge) to the validated operating point, and measures the kept window
    at stationarity.  Warmup cost is reported separately
    (ess_per_sec_incl_warmup) — the standard MCMC benchmarking convention.
  * Cross-chain rank-normalized R-hat is reported alongside: median and
    max over probes, plus loglik's own R-hat (the slowest direction).
  * Utilization uses ANALYTIC per-sweep FLOPs (benchmarks/flops.py;
    validated within 2x of XLA's one-sweep cost analysis) times trip
    count — XLA's cost_analysis does not scale scan bodies.

Env knobs: BENCH_WARMUP (default 150000 — the measured plateau of the
equilibration transient), BENCH_KEPT (default 20000), BENCH_CHAINS
(default 64), BENCH_GAUGE=0/1 (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")          # keep baseline 1-thread
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import numpy as np

WARMUP = int(os.environ.get("BENCH_WARMUP", 150000))
KEPT = int(os.environ.get("BENCH_KEPT", 20000))
N_CHAINS = int(os.environ.get("BENCH_CHAINS", 64))
GAUGE = os.environ.get("BENCH_GAUGE", "1") == "1"
ANNEAL = min(5000, WARMUP)
CHUNK = 5000


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bayesfmmm_tpu.config import ModelConfig, Priors
    from bayesfmmm_tpu.diagnostics import (rank_normalized_ess,
                                           rank_normalized_rhat)
    from bayesfmmm_tpu.models.likelihood import log_likelihood
    from bayesfmmm_tpu.models.state import init_state
    from bayesfmmm_tpu.ops import gibbs
    from bayesfmmm_tpu.ops.mean import compute_mu
    from bayesfmmm_tpu.utils.init_strategies import spectral_init
    from bayesfmmm_tpu.utils.simulate import simulate_functional

    K, P, M, N = 3, 8, 4, 100
    data, _ = simulate_functional(seed=7, N=N, K=K, P=P, M=M,
                                  n_time=(100, 100))
    hp = Priors()
    c = jnp.full((K,), 10.0)
    cfg = ModelConfig(K=K, P=P, M=M)

    key = jax.random.PRNGKey(0)
    chain_keys = jax.random.split(key, N_CHAINS)
    states = jax.jit(jax.vmap(lambda k: init_state(k, cfg, data)))(chain_keys)
    sp = spectral_init(data, K, M)
    dtype = data.y.dtype
    sp_jax = {k: jnp.asarray(v, dtype) for k, v in sp.items()}

    def seed_chain(st, k):
        jit_z = 0.02 * jax.random.normal(k, sp_jax["Z"].shape, dtype)
        Z0 = jnp.clip(sp_jax["Z"] + jit_z, 1e-4, None)
        return st.replace(
            Z=Z0 / jnp.sum(Z0, axis=1, keepdims=True), nu=sp_jax["nu"],
            chi=sp_jax["chi"], Phi=sp_jax["Phi"], sigma2=sp_jax["sigma2"])

    states = jax.jit(jax.vmap(seed_chain))(states, chain_keys)

    probe_obs = jnp.arange(0, N, N // 8)[:8]
    probe_t = jnp.array([0, data.L // 4, data.L // 2, 3 * data.L // 4,
                         data.L - 1])

    # ---- annealed, chunked warmup to the validated operating point ----
    def warm_chain(k, st, b0, b1):
        def body(carry, inp):
            kk, b = inp
            return gibbs.sweep_full(kk, carry, data, hp, c, beta=b,
                                    gauge=GAUGE), None
        bs = jnp.linspace(b0, b1, CHUNK).astype(dtype)
        st, _ = jax.lax.scan(body, st, (jax.random.split(k, CHUNK), bs))
        return st

    warm_f = jax.jit(jax.vmap(warm_chain, in_axes=(0, 0, None, None)))
    t0 = time.time()
    n_chunks = max(1, WARMUP // CHUNK)
    for ci in range(n_chunks):
        lo, hi = ci * CHUNK, (ci + 1) * CHUNK
        bseg = np.interp([lo, hi - 1], [0, max(ANNEAL - 1, 1), WARMUP],
                         [0.2, 1.0, 1.0])
        states = warm_f(
            jax.vmap(lambda k: jax.random.fold_in(k, 101 + ci))(chain_keys),
            states, float(bseg[0]), float(bseg[1]))
        jax.block_until_ready(states.Z)
    warm_s = time.time() - t0

    # ---- measured kept window ----
    def kept_chain(k, st):
        def body(carry, kk):
            st = gibbs.sweep_full(kk, carry, data, hp, c, gauge=GAUGE)
            mu = compute_mu(data, st)
            probes = mu[probe_obs][:, probe_t].ravel()
            ll = log_likelihood(st, data)
            return st, jnp.concatenate([probes, ll[None]])
        return jax.lax.scan(body, st, jax.random.split(k, KEPT))

    run = jax.jit(jax.vmap(kept_chain))
    t0 = time.time()
    compiled = run.lower(chain_keys, states).compile()
    compile_s = time.time() - t0
    kkeys = jax.vmap(lambda k: jax.random.fold_in(k, 777))(chain_keys)
    t0 = time.time()
    final, out = compiled(kkeys, states)
    jax.block_until_ready(out)
    elapsed = time.time() - t0

    out = np.asarray(out)                      # (chains, kept, n_q)
    n_q = out.shape[2]
    ess_q = [rank_normalized_ess(out[:, :, j]) for j in range(n_q)]
    rhat_q = [rank_normalized_rhat(out[:, :, j]) for j in range(n_q)]
    ess_total = float(np.median(ess_q))
    tpu_ess_per_sec = ess_total / elapsed
    tpu_iters_per_sec = N_CHAINS * KEPT / elapsed
    within = [float(np.median([rank_normalized_ess(out[ci, :, j][None])
                               for j in range(n_q)]))
              for ci in range(0, N_CHAINS, max(1, N_CHAINS // 8))]
    within_per_iter = float(np.mean(within)) / KEPT

    # ---- utilization from analytic per-sweep FLOPs ----
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    try:
        from flops import sweep_flops
        from utilization import cost_stats
        per_sweep = sweep_flops(N, int(data.L), P, K, M,
                                identity_basis=False)["total"]
        total_flops = per_sweep * N_CHAINS * KEPT
        util = cost_stats(compiled, elapsed, flops=total_flops,
                          source="analytic_per_sweep_x_trip_count")
        util["flops_per_sweep"] = per_sweep
    except Exception as e:
        util = {"error": str(e)}

    # ---- CPU single-thread baseline (measured) ----
    from numpy_baseline import NumpyGibbs
    hp_np = dict(a_Z_PM=hp.a_Z_PM, alpha_nu=hp.alpha_nu, beta_nu=hp.beta_nu,
                 alpha_0=hp.alpha_0, beta_0=hp.beta_0, nu_1=hp.nu_1)
    base = NumpyGibbs(np.asarray(data.y), np.asarray(data.mask),
                      np.asarray(data.B), np.asarray(data.pen), K, M, hp_np)
    s = base.init_state()
    for name in ("Z", "nu", "chi", "Phi"):
        s[name] = np.asarray(sp[name], dtype=np.float64)
    s["sigma2"] = float(sp["sigma2"])
    base.sweep(s)
    n_base = 15
    t0 = time.time()
    for _ in range(n_base):
        base.sweep(s)
    base_iters_per_sec = n_base / (time.time() - t0)
    # vs_baseline credits the baseline with the TPU sampler's OWN measured
    # per-chain ESS/iter — conservative: the TPU kernels (joint blocked
    # draws, gauge moves) mix at least as well per sweep.
    base_ess_per_sec = within_per_iter * base_iters_per_sec

    result = {
        "metric": f"ess_per_sec_functional_K3_P8_N100_{N_CHAINS}chains",
        "value": round(tpu_ess_per_sec, 2),
        "unit": "ESS/s",
        "vs_baseline": round(tpu_ess_per_sec / base_ess_per_sec, 2),
        "detail": {
            "backend": jax.default_backend(),
            "protocol": {"warmup": WARMUP, "anneal": ANNEAL, "kept": KEPT,
                         "gauge_moves": GAUGE},
            "rhat_median": round(float(np.median(rhat_q)), 4),
            "rhat_max": round(float(np.max(rhat_q)), 4),
            "ess_multichain_median_probe": round(ess_total, 1),
            "ess_within_chain_per_iter": round(within_per_iter, 4),
            "tpu_iters_per_sec": round(tpu_iters_per_sec, 1),
            "baseline_iters_per_sec": round(base_iters_per_sec, 2),
            "ess_per_sec_incl_warmup": round(
                ess_total / (elapsed + warm_s), 2),
            "warmup_s": round(warm_s, 1),
            "compile_s": round(compile_s, 1),
            "timed_s": round(elapsed, 2),
            "utilization": util,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
