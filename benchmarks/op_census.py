"""Critical-path op census of the production sweep (round-4 VERDICT #5).

The chain-scaling ladder saturates at ~145k chain-sweeps/s from 256
chains while the recorded utilization is ~0.1% MFU and ~0.004% of HBM
bandwidth — by the ANALYTIC accounting.  Inside a `lax.scan` the op graph
is latency-serialized, so wall time is the sum of per-op costs; this
script explains where those costs live by parsing the optimized HLO of
one sweep body and computing, per top-level op:

  * the TILE-PADDED operand+result bytes (TPU vregs are (8, 128) f32
    tiles: a (256,) vector op touches a full 8x128 tile per 1024 logical
    lanes; a (chains, 3) operand pads 3 -> 128 lanes, a 42x waste) — the
    analytic byte count ignores this, which is exactly why the recorded
    "0.004% of HBM" is misleading;
  * a fixed per-op issue overhead, fit from the measured wall at two
    chain counts (wall = n_ops * tau + padded_bytes / BW).

Census output: op count by opcode, padded-vs-logical byte ratio, the
implied tau, and the top-k ops by padded bytes.

Usage: python benchmarks/op_census.py [--chains 256] [--collapsed 1]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# f32 tile (8, 128); the lane dim pads to 128, sublane to 8.
def padded_bytes(shape, dtype_bits=32):
    if not shape:
        n = 8 * 128
    elif len(shape) == 1:
        n = -(-shape[0] // 8) * 8 * 128
    else:
        lead = 1
        for d in shape[:-2]:
            lead *= d
        n = lead * (-(-shape[-2] // 8) * 8) * (-(-shape[-1] // 128) * 128)
    return n * dtype_bits // 8


def logical_bytes(shape, dtype_bits=32):
    n = 1
    for d in shape:
        n *= d
    return n * dtype_bits // 8


_SHAPE_RE = re.compile(r"(f32|f16|bf16|s32|u32|pred|s8|u8)\[([\d,]*)\]")
_OP_RE = re.compile(r"^\s+\S+ = \S+\[?.*?\]?\s*([a-z][a-z0-9\-]*)\(")


def parse_entry_ops(hlo_text):
    """(opcode, result_shapes, operand_shape_count) per top-level op of the
    entry computation; fusions count as ONE op (they execute as one)."""
    lines = hlo_text.splitlines()
    # find ENTRY computation block
    in_entry = False
    ops = []
    depth = 0
    for ln in lines:
        if ln.startswith("ENTRY"):
            in_entry = True
            depth = 0
        if not in_entry:
            continue
        depth += ln.count("{") - ln.count("}")
        m = _OP_RE.match(ln)
        if m:
            opcode = m.group(1)
            shapes = []
            for dm in _SHAPE_RE.finditer(ln):
                dims = [int(x) for x in dm.group(2).split(",") if x]
                bits = {"f32": 32, "s32": 32, "u32": 32, "f16": 16,
                        "bf16": 16, "pred": 8, "s8": 8, "u8": 8}[dm.group(1)]
                shapes.append((dims, bits))
            ops.append((opcode, shapes))
        if in_entry and depth <= 0 and "}" in ln and not ln.startswith("ENTRY"):
            break
    return ops


def census(ops):
    by_opcode = collections.Counter()
    pad_b = 0
    log_b = 0
    per_op = []
    for opcode, shapes in ops:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        by_opcode[opcode] += 1
        pb = sum(padded_bytes(s, b) for s, b in shapes)
        lb = sum(logical_bytes(s, b) for s, b in shapes)
        pad_b += pb
        log_b += lb
        per_op.append((pb, opcode, shapes[0][0] if shapes else []))
    per_op.sort(reverse=True)
    return by_opcode, pad_b, log_b, per_op


def measure(chains, sweeps, collapsed, gauge):
    import jax
    import jax.numpy as jnp

    from bayesfmmm_tpu.config import ModelConfig, Priors
    from bayesfmmm_tpu.models.state import init_state
    from bayesfmmm_tpu.ops import gibbs
    from bayesfmmm_tpu.utils.simulate import simulate_functional

    K, P, M, N = 3, 8, 4, 100
    data, _ = simulate_functional(seed=7, N=N, K=K, P=P, M=M,
                                  n_time=(100, 100))
    hp = Priors()
    c = jnp.full((K,), 10.0)
    cfg = ModelConfig(K=K, P=P, M=M)
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    states = jax.jit(jax.vmap(lambda k: init_state(k, cfg, data)))(keys)

    def chain(k, st):
        def body(carry, kk):
            return gibbs.sweep_full(kk, carry, data, hp, c, gauge=gauge,
                                    collapsed_z=collapsed, p_indep=0.3), None
        st, _ = jax.lax.scan(body, st, jax.random.split(k, sweeps))
        return st

    run = jax.jit(jax.vmap(chain))
    lowered = run.lower(keys, states)
    compiled = lowered.compile()
    out = compiled(keys, states)
    jax.block_until_ready(out.sigma2)
    kk = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    t0 = time.time()
    out = compiled(kk, states)
    jax.block_until_ready(out.sigma2)
    wall = time.time() - t0
    return compiled.as_text(), wall / sweeps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=2000)
    ap.add_argument("--collapsed", type=int, default=1)
    ap.add_argument("--gauge", type=int, default=1)
    ap.add_argument("--chain_counts", default="256,512")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    import jax
    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    counts = [int(x) for x in args.chain_counts.split(",")]
    results = {}
    for cc in counts:
        hlo, per_sweep_s = measure(cc, args.sweeps, bool(args.collapsed),
                                   bool(args.gauge))
        # census the scan body computation: find the while body with the
        # most ops (the sweep); entry-level census would see ONE while op
        bodies = re.split(r"\n\n", hlo)
        best = None
        for b in bodies:
            if not b.lstrip().startswith(("%", "ENTRY", "body")):
                continue
            ops = []
            for ln in b.splitlines():
                m = _OP_RE.match(ln)
                if m:
                    shapes = []
                    for dm in _SHAPE_RE.finditer(ln):
                        dims = [int(x) for x in dm.group(2).split(",") if x]
                        bits = {"f32": 32, "s32": 32, "u32": 32, "f16": 16,
                                "bf16": 16, "pred": 8, "s8": 8,
                                "u8": 8}[dm.group(1)]
                        shapes.append((dims, bits))
                    ops.append((m.group(1), shapes))
            if best is None or len(ops) > len(best):
                best = ops
        by_op, pad_b, log_b, per_op = census(best)
        n_ops = sum(by_op.values())
        results[cc] = dict(per_sweep_us=per_sweep_s * 1e6, n_ops=n_ops,
                           padded_mb=pad_b / 1e6, logical_mb=log_b / 1e6,
                           by_opcode=dict(by_op.most_common(12)),
                           top_ops=[(round(pb / 1e6, 3), oc, tuple(sh))
                                    for pb, oc, sh in per_op[:args.top]])

    # fit wall = n_ops * tau + padded_bytes / BW from the two chain counts
    out = {"config": {"collapsed": bool(args.collapsed),
                      "gauge": bool(args.gauge), "sweeps": args.sweeps},
           "per_chain_count": results}
    if len(counts) == 2:
        c1, c2 = counts
        r1, r2 = results[c1], results[c2]
        # assume same op count (shapes differ only in batch): tau from
        # extrapolating to zero padded bytes
        dB = (r2["padded_mb"] - r1["padded_mb"]) * 1e6
        dT = (r2["per_sweep_us"] - r1["per_sweep_us"]) * 1e-6
        bw = dB / dT if dT > 0 else float("inf")
        tau = (r1["per_sweep_us"] * 1e-6
               - r1["padded_mb"] * 1e6 / bw) / max(r1["n_ops"], 1)
        out["fit"] = {
            "effective_bandwidth_GBps": round(bw / 1e9, 1),
            "tau_us_per_op": round(tau * 1e6, 3),
            "padded_over_logical": round(r1["padded_mb"]
                                         / max(r1["logical_mb"], 1e-9), 1),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
