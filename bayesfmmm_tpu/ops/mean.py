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
O(N·L·P·K·M) FLOPs and HBM traffic and is never needed.  When D == 0 the
eta/xi einsums contract over an empty axis and vanish for free.

Second TPU-native identity (Gram space): every Gibbs conditional only needs
residuals through B_n' r_n and ||r_n||^2, and with the precomputed
sufficient statistics u_n = B_n'y_n, G_n = B_n'B_n, yy_n = ||y_n||^2
(models/state.py) these are

    B_n' r_n   = u_n − G_n w_n,
    ||r_n||^2  = yy_n − 2 u_n·w_n + w_n'G_n w_n,

so the sweep maintains only the P-vector w_n per observation and NO (N, L)
tensor appears in the hot loop at all — an L/P-fold cut in HBM traffic
(the reference recomputes length-n_i residuals in every scalar loop,
UpdateNu.h:42-63).  mu itself is materialized only at trace/likelihood
time via compute_mu.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

_EINSUM_KW = dict(precision="highest")


@struct.dataclass
class SweepCache:
    """Running effective mean coefficients, maintained through a sweep.

    w[n] is the P-vector such that the model mean is mu_n = B_n w[n]; each
    blocked updater subtracts its own rank-1 contribution, redraws, and adds
    it back — all in P-dimensional Gram space."""
    w: jnp.ndarray      # (N, P)


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
    return SweepCache(w=effective_coeffs(state, data.X))


def rss_from_coeffs(data, w):
    """sum_n ||y_n - B_n w_n||^2 via the Gram identity (per-n to limit
    f32 cancellation; padded entries contribute zero through u/G/yy)."""
    per_n = (data.yy
             - 2.0 * jnp.einsum("np,np->n", w, data.u, **_EINSUM_KW)
             + jnp.einsum("np,npq,nq->n", w, data.G, w, **_EINSUM_KW))
    return jnp.sum(per_n)


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
