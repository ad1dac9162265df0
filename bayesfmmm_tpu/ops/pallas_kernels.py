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
