"""Pallas TPU kernels for the sampler's hot elementwise/reduction path.

The Gibbs sweep's inner workhorse is the batched basis matvec
``mu[n, l] = sum_p B[n, l, p] w[n, p]`` followed immediately by residual
formation and squared-residual reductions (sigma^2 update, likelihood,
tempered-acceptance pzeta).  XLA fuses most of this already; the Pallas
kernel guarantees the fusion — one pass over B per call, with the residual
sum produced in the same kernel so ``y``/``mu`` never round-trip to HBM
between the matvec and the reduction.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid over observation tiles; within a tile the P-contraction unrolls as
    VPU fused multiply-adds over (TILE_N, L) blocks — P is small (8-64), so
    the MXU's 128x128 systolic array would be underfed; the VPU form keeps
    lanes full with L on the 128-lane axis.
  * per-tile partial RSS lands in its own output row; the (num_tiles,)
    vector is summed by the caller (cheap, keeps the kernel accumulator-free
    and grid-parallel).
  * opt-in via BFMMM_USE_PALLAS=1 (interpret mode used automatically on
    CPU so the same code path tests everywhere).

Round-4 status of these fusion kernels: default-OFF, measured twice.  At
L ~ 100 they are latency-tied with XLA's own fusion (BENCH_SUITE r03 §7);
at L = 1024 under the chain vmap they fail to compile (the batching rule
folds the chain batch into the block -> 27.7 MB scoped VMEM vs the 16 MB
core limit; BENCH_SUITE.md §6), so the former "large-L regime" claim is
withdrawn.  The Pallas kernel that IS default-on is
``chol_solve_batch_minor`` below — batch-minor by construction so the
chain batch lands on lanes, built for the latency regime where XLA's
stock linalg lowerings lose (ops/linalg.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret():
    return jax.default_backend() != "tpu"


def use_pallas() -> bool:
    return os.environ.get("BFMMM_USE_PALLAS", "0") == "1"


def _mean_rss_kernel(b_ref, w_ref, y_ref, mu_ref, rss_ref):
    P = b_ref.shape[2]
    mu = jnp.zeros(mu_ref.shape, dtype=jnp.float32)
    for p in range(P):  # static unroll: VPU multiply-add per basis column
        mu = mu + b_ref[:, :, p] * w_ref[:, p][:, None]
    mu_ref[:, :] = mu.astype(mu_ref.dtype)
    r = y_ref[:, :] - mu
    # partial RSS: each grid step owns one row of the full (num_tiles, 128)
    # output block (TPU block tiling disallows 1-row blocks; a full-array
    # block with program_id row indexing sidesteps it)
    i = pl.program_id(0)
    rss_ref[i, :] = jnp.full((rss_ref.shape[1],), jnp.sum(r * r),
                             dtype=rss_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def fused_mean_rss(B, w, y, tile_n=8):
    """Returns (mu (N, L), rss scalar) in one pass over B.

    B: (N, L, P) pre-masked basis; w: (N, P) effective coefficients;
    y: (N, L) pre-zeroed observations.
    """
    N, L, P = B.shape
    tile_n = min(tile_n, N)
    num_tiles = pl.cdiv(N, tile_n)
    pad = num_tiles * tile_n - N
    if pad:
        B = jnp.pad(B, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
        y = jnp.pad(y, ((0, pad), (0, 0)))

    mu, rss_parts = pl.pallas_call(
        _mean_rss_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, L, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_tiles, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles * tile_n, L), B.dtype),
            jax.ShapeDtypeStruct((num_tiles, 128), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(B, w, y)
    if pad:
        mu = mu[:N]
    return mu, jnp.sum(rss_parts[:, 0])


def _weighted_gram_kernel(g_ref, wt_ref, out_ref):
    # out[i, p, q] = sum_n wt[n] G[n, p, q] for tile i; caller sums tiles.
    P = g_ref.shape[1]
    acc = jnp.zeros((P, P), dtype=jnp.float32)
    TN = g_ref.shape[0]
    for n in range(TN):  # static unroll over the tile
        acc = acc + wt_ref[n, 0] * g_ref[n, :, :]
    out_ref[pl.program_id(0), :, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def weighted_gram(G, wt, tile_n=8):
    """sum_n wt[n] * G[n] — the data-precision assembly of every blocked
    Gibbs update (UpdateNu.h:47, UpdatePhi.h:50-51 rank-1 accumulations,
    precomputed here as weighted Gram sums)."""
    N, P, _ = G.shape
    tile_n = min(tile_n, N)
    num_tiles = pl.cdiv(N, tile_n)
    pad = num_tiles * tile_n - N
    if pad:
        G = jnp.pad(G, ((0, pad), (0, 0), (0, 0)))
        wt = jnp.pad(wt, ((0, pad),))
    wt2 = wt[:, None]

    parts = pl.pallas_call(
        _weighted_gram_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, P, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_tiles, P, P), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, P), G.dtype),
        interpret=_use_interpret(),
    )(G, wt2)
    return jnp.sum(parts, axis=0)


# ---------------------------------------------------------------------------
# Batch-minor fused Cholesky + solves — the joint blocked draw's hot op.
#
# The production sweep's joint (Phi/xi) draw factorizes one (D, D) SPD
# precision per chain per sweep with D = K*M*P ~ 96.  Inside the scan's
# latency chain, XLA's stock lowerings dominate the entire sweep: both
# `cholesky` and `triangular_solve` lower to while loops of ~D iterations
# with a measured ~5-30 us per-iteration overhead (see
# benchmarks/kernel_breakdown.py; 2.97 ms/sweep for the batched Cholesky
# alone at D=96, 256 chains — 60% of the whole sweep).
#
# This kernel runs the WHOLE factor-and-solve pipeline in ONE launch, with
# the chain batch on the 128-lane axis (batch-minor layout): a
# Cholesky-Crout elimination whose j-th step is a single fused
# (D, D, CB)-shaped VPU op, then forward/backward substitution sweeps of
# (D, CB) ops.  Loop iterations are hardware loop steps, not XLA while
# iterations.
# ---------------------------------------------------------------------------

_CHOL_CB = 128            # chains per grid step (lane width)
_CHOL_MAX_DIM = 128       # VMEM guard: 2 * D^2 * CB * 4B must fit in ~16MB


def _chol_solve_kernel(a_ref, b_ref, z_ref, mean_ref, noise_ref, aw, u):
    D = a_ref.shape[0]
    aw[:] = a_ref[:]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)[:, :, None]
    row_ids1 = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)

    def chol_step(j, _):
        dj = aw[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]          # (CB,)
        inv = jax.lax.rsqrt(dj)
        col = aw[:, pl.ds(j, 1), :][:, 0, :]                # (D, CB)
        Lcol = col * inv[None, :]
        # trailing update on columns > j only (rows <= j there are upper-
        # triangle scratch); then store the finished L column.
        A = aw[:]
        aw[:] = jnp.where(col_ids > j,
                          A - Lcol[:, None, :] * Lcol[None, :, :], A)
        aw[:, pl.ds(j, 1), :] = Lcol[:, None, :]
        return 0

    jax.lax.fori_loop(0, D, chol_step, 0)

    # forward substitution: w = L^{-1} b (into u[0]); stage z into u[1]
    u[0, :, :] = b_ref[:]
    u[1, :, :] = z_ref[:]

    def fwd_step(j, _):
        dj = aw[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        wj = u[0, pl.ds(j, 1), :][0] / dj                   # (CB,)
        col = aw[:, pl.ds(j, 1), :][:, 0, :]                # (D, CB)
        W = u[0, :, :]
        u[0, :, :] = jnp.where(row_ids1 > j, W - col * wj[None, :], W)
        u[0, pl.ds(j, 1), :] = wj[None, :]
        return 0

    jax.lax.fori_loop(0, D, fwd_step, 0)

    # backward substitution on both stacked rhs: x = L^{-T} u
    def bwd_step(jj, _):
        j = D - 1 - jj
        dj = aw[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        mj = u[:, pl.ds(j, 1), :][:, 0, :] / dj[None, :]    # (2, CB)
        rowL = aw[pl.ds(j, 1), :, :][0]                     # (D, CB) = L[j, i]
        U = u[:]
        u[:] = jnp.where((row_ids1 < j)[None],
                         U - rowL[None] * mj[:, None, :], U)
        u[:, pl.ds(j, 1), :] = mj[:, None, :]
        return 0

    jax.lax.fori_loop(0, D, bwd_step, 0)
    mean_ref[:] = u[0, :, :]
    noise_ref[:] = u[1, :, :]


def chol_solve_batch_minor(A_T, b_T, z_T):
    """(mean, noise) of a precision draw, batch-minor: A_T (D, D, C) SPD,
    b_T/z_T (D, C); returns mean = A^{-1} b and noise = chol(A)^{-T} z,
    both (D, C).  C is padded to a multiple of 128 lanes by the caller's
    wrapper (joint_precision_draw below)."""
    D, _, C = A_T.shape
    grid = C // _CHOL_CB
    mean, noise = pl.pallas_call(
        _chol_solve_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((D, D, _CHOL_CB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _CHOL_CB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _CHOL_CB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, _CHOL_CB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _CHOL_CB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, C), A_T.dtype),
            jax.ShapeDtypeStruct((D, C), A_T.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, D, _CHOL_CB), jnp.float32),
            pltpu.VMEM((2, D, _CHOL_CB), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(A_T, b_T, z_T)
    return mean, noise
