"""Vectorized mean-structure assembly for the mixed membership likelihood.

The model mean (README.md:14):

    E[y_i(t_l)] = sum_k Z_ik [ B_il·(nu_k + eta_k x_i)
                               + sum_m chi_im B_il·(Phi_km + xi_km x_i) ]

The reference recomputes scalar dot products of this expression inside
quadruple loops in every updater (e.g. UpdateNu.h:42-63, UpdatePhi.h:44-71).

TPU-native key identity: the whole bracket collapses to ONE P-vector per
observation,

    w_n = sum_k Z_nk [ nu_k + eta_k x_n + (Phi_k + xi_k x_n) chi_n ],

so  mu = batched-matvec(B, w)  at O(N·K·P·(M + D + M·D)) + O(N·L·P) cost —
the naive design-product materialization B·Phi of shape (N, L, K, M) costs
O(N·L·P·K·M) FLOPs and HBM traffic and is never needed.  Each conditional
updater forms its residual by *adding back its own term* (an O(N·L·P)
matvec) against the cached total mean.  When D == 0 the eta/xi einsums
contract over an empty axis and vanish for free.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

_EINSUM_KW = dict(precision="highest")


@struct.dataclass
class SweepCache:
    """Running model mean, maintained incrementally through a sweep."""
    mu: jnp.ndarray     # (N, L)


def effective_coeffs(state, X):
    """w[n, p] — the per-observation basis coefficients of the model mean."""
    w = jnp.einsum("nk,kp->np", state.Z, state.nu, **_EINSUM_KW)
    w = w + jnp.einsum("nk,kpm,nm->np", state.Z, state.Phi, state.chi,
                       **_EINSUM_KW)
    if X.shape[1] > 0:
        w = w + jnp.einsum("nk,kpd,nd->np", state.Z, state.eta, X,
                           **_EINSUM_KW)
        w = w + jnp.einsum("nk,kpdm,nd,nm->np", state.Z, state.xi, X,
                           state.chi, **_EINSUM_KW)
    return w


def compute_mu(data, state):
    w = effective_coeffs(state, data.X)
    if getattr(data, "identity_basis", False):
        return w                               # B = I, L = P
    from bayesfmmm_tpu.ops import pallas_kernels
    if pallas_kernels.use_pallas():
        mu, _ = pallas_kernels.fused_mean_rss(data.B, w, data.y)
        return mu
    return jnp.einsum("nlp,np->nl", data.B, w, **_EINSUM_KW)


def build_cache(data, state) -> SweepCache:
    return SweepCache(mu=compute_mu(data, state))


def refresh_mu(cache: SweepCache, data, state) -> SweepCache:
    """Full recompute after a Z redraw (cheap: one matvec batch)."""
    return cache.replace(mu=compute_mu(data, state))


def feature_offsets(state, X):
    """T[n, k, p] = nu_k + eta_k x_n + (Phi_k + xi_k x_n) chi_n — the
    per-feature mean coefficients seen by observation n (Z-independent).
    Used by the Z updater: mu_n(Z-row) = B_n (sum_k z_k T_nk)."""
    T = state.nu[None] + jnp.einsum("kpm,nm->nkp", state.Phi, state.chi,
                                    **_EINSUM_KW)
    if X.shape[1] > 0:
        T = T + jnp.einsum("kpd,nd->nkp", state.eta, X, **_EINSUM_KW)
        T = T + jnp.einsum("kpdm,nd,nm->nkp", state.xi, X, state.chi,
                           **_EINSUM_KW)
    return T


def eigen_directions(state, X):
    """U[n, p, m] = sum_k Z_nk (Phi_k + xi_k x_n) — the effective
    eigen-directions for observation n.  Used by the chi updater
    (F[n, l, m] = B_n U_n)."""
    U = jnp.einsum("nk,kpm->npm", state.Z, state.Phi, **_EINSUM_KW)
    if X.shape[1] > 0:
        U = U + jnp.einsum("nk,kpdm,nd->npm", state.Z, state.xi, X,
                           **_EINSUM_KW)
    return U
