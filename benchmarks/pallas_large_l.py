"""Measured Pallas-vs-XLA decision in the kernels' own stated regime.

Round-3 kept the opt-in Pallas kernels (ops/pallas_kernels.py) on the
argument that at L >> 128 the basis matvec + residual reduction becomes
bandwidth-limited and the guaranteed fusion wins; round-3 VERDICT weak #8
ruled that keep speculative until measured.  This benchmark times the FULL
production sweep at large L with BFMMM_USE_PALLAS=0 and =1 in separate
subprocesses (the flag is read at trace time), plus the fused op in
isolation, and prints one JSON line with the verdict.

Usage: python benchmarks/pallas_large_l.py [--L 1024] [--chains 64]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = textwrap.dedent("""
    import json, os, sys, time
    L = int(sys.argv[1]); chains = int(sys.argv[2]); sweeps = int(sys.argv[3])
    import jax, jax.numpy as jnp
    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bayesfmmm_tpu.config import ModelConfig, Priors
    from bayesfmmm_tpu.models.state import init_state
    from bayesfmmm_tpu.ops import gibbs, pallas_kernels
    from bayesfmmm_tpu.utils.simulate import simulate_functional

    K, P, M, N = 3, 8, 4, 100
    data, _ = simulate_functional(seed=7, N=N, K=K, P=P, M=M,
                                  n_time=(L, L))
    hp = Priors(); c = jnp.full((K,), 10.0)
    cfg = ModelConfig(K=K, P=P, M=M)
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    states = jax.jit(jax.vmap(lambda k: init_state(k, cfg, data)))(keys)

    def chain(k, st):
        def body(carry, kk):
            return gibbs.sweep_full(kk, carry, data, hp, c,
                                    gauge=True), None
        st, _ = jax.lax.scan(body, st, jax.random.split(k, sweeps))
        return st

    run = jax.jit(jax.vmap(chain), donate_argnums=(1,))
    states = run(keys, states); jax.block_until_ready(states.Z)
    kk = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    t0 = time.time(); states = run(kk, states)
    jax.block_until_ready(states.Z)
    dt = time.time() - t0

    # fused op in isolation: mu + rss over (chains*N, L, P)
    w = jnp.ones((chains * N, P), jnp.float32)
    B = jnp.tile(data.B, (chains, 1, 1))
    y = jnp.tile(data.y, (chains, 1))
    if pallas_kernels.use_pallas():
        op = jax.jit(lambda B, w, y: pallas_kernels.fused_mean_rss(B, w, y))
    else:
        def ref(B, w, y):
            mu = jnp.einsum("nlp,np->nl", B, w)
            r = y - mu
            return mu, jnp.sum(r * r)
        op = jax.jit(ref)
    out = op(B, w, y); jax.block_until_ready(out[1])
    reps = 50
    t0 = time.time()
    for _ in range(reps):
        out = op(B, w, y)
    jax.block_until_ready(out[1])
    op_ms = (time.time() - t0) / reps * 1e3
    print(json.dumps({"pallas": pallas_kernels.use_pallas(),
                      "sweep_time_s": round(dt, 3),
                      "chain_sweeps_per_sec": round(chains * sweeps / dt, 1),
                      "fused_op_ms": round(op_ms, 3)}))
""")


def run_one(use_pallas, L, chains, sweeps):
    # append (not replace) PYTHONPATH: the axon sitecustomize that registers
    # the TPU backend plugin lives on the inherited PYTHONPATH
    pp = os.environ.get("PYTHONPATH", "")
    env = {**os.environ,
           "PYTHONPATH": os.getcwd() + (os.pathsep + pp if pp else ""),
           "BFMMM_USE_PALLAS": "1" if use_pallas else "0"}
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_WORKER)
        worker = f.name
    try:
        out = subprocess.run(
            [sys.executable, worker, str(L), str(chains), str(sweeps)],
            capture_output=True, text=True, timeout=1200, env=env)
        assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        return json.loads(line[-1])
    finally:
        os.unlink(worker)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=1024)
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--sweeps", type=int, default=500)
    args = ap.parse_args()
    xla = run_one(False, args.L, args.chains, args.sweeps)
    try:
        pal = run_one(True, args.L, args.chains, args.sweeps)
        verdict = ("pallas wins" if pal["sweep_time_s"]
                   < 0.98 * xla["sweep_time_s"] else "xla wins or tie")
        extra = {
            "pallas": pal,
            "sweep_speedup_pallas": round(
                xla["sweep_time_s"] / pal["sweep_time_s"], 3),
            "fused_op_speedup_pallas": round(
                xla["fused_op_ms"] / pal["fused_op_ms"], 3),
        }
    except AssertionError as e:
        msg = str(e)
        verdict = ("pallas NOT VIABLE in this regime: compile failure "
                   "(vmapped batching folds the chain batch into the "
                   "kernel block -> VMEM OOM at large L)")
        extra = {"pallas_error": msg[-400:]}
    print(json.dumps({
        "metric": "pallas_large_L_decision",
        "L": args.L, "chains": args.chains, "sweeps": args.sweeps,
        "xla": xla, "verdict": verdict, **extra,
    }))


if __name__ == "__main__":
    main()
