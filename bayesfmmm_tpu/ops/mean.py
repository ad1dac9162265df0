"""Vectorized mean-structure assembly for the mixed membership likelihood.

The model mean (README.md:14):

    E[y_i(t_l)] = sum_k Z_ik [ B_il·(nu_k + eta_k x_i)
                               + sum_m chi_im B_il·(Phi_km + xi_km x_i) ]

The reference recomputes scalar dot products of this expression inside
quadruple loops in every updater (e.g. UpdateNu.h:42-63, UpdatePhi.h:44-71).
The TPU-native design computes four batched design products ONCE per sweep:

    Bnu0 [N,L,K]    = B · nu                 (feature means)
    Beta [N,L,K]    = B · (eta @ x_i)        (covariate mean shifts)
    BPhi0[N,L,K,M]  = B · Phi                (pseudo-eigenfunctions)
    Bxi  [N,L,K,M]  = B · (xi @ x_i)         (covariate eigen shifts)

and each conditional updater forms its residual by *adding back its own
term* to the cached total mean — an O(N·L·P) incremental correction instead
of an O(N·L·K·M·P) recompute.  When D == 0 the eta/xi products are exact
zeros of zero cost (einsum over an empty axis).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

_EINSUM_KW = dict(precision="highest")


@struct.dataclass
class SweepCache:
    """Design products + running model mean, maintained through a sweep."""
    Bnu0: jnp.ndarray   # (N, L, K)      B @ nu_k
    Beta: jnp.ndarray   # (N, L, K)      B @ (eta_k x_i)
    BPhi0: jnp.ndarray  # (N, L, K, M)   B @ Phi_km
    Bxi: jnp.ndarray    # (N, L, K, M)   B @ (xi_km x_i)
    mu: jnp.ndarray     # (N, L)         current model mean

    @property
    def Bnu(self):
        return self.Bnu0 + self.Beta

    @property
    def BPhi(self):
        return self.BPhi0 + self.Bxi


def compute_mu(Z, chi, Bnu, BPhi):
    """mu[n,l] = sum_k Z_nk Bnu[n,l,k] + sum_km Z_nk chi_nm BPhi[n,l,k,m]."""
    mean_nu = jnp.einsum("nk,nlk->nl", Z, Bnu, **_EINSUM_KW)
    mean_phi = jnp.einsum("nk,nm,nlkm->nl", Z, chi, BPhi, **_EINSUM_KW)
    return mean_nu + mean_phi


def build_cache(data, state) -> SweepCache:
    """Recompute all design products fresh (start of each sweep)."""
    B, X = data.B, data.X
    Bnu0 = jnp.einsum("nlp,kp->nlk", B, state.nu, **_EINSUM_KW)
    Beta = jnp.einsum("nlp,kpd,nd->nlk", B, state.eta, X, **_EINSUM_KW)
    BPhi0 = jnp.einsum("nlp,kpm->nlkm", B, state.Phi, **_EINSUM_KW)
    Bxi = jnp.einsum("nlp,kpdm,nd->nlkm", B, state.xi, X, **_EINSUM_KW)
    mu = compute_mu(state.Z, state.chi, Bnu0 + Beta, BPhi0 + Bxi)
    return SweepCache(Bnu0=Bnu0, Beta=Beta, BPhi0=BPhi0, Bxi=Bxi, mu=mu)


def refresh_mu(cache: SweepCache, Z, chi) -> SweepCache:
    """Recompute mu after a Z or chi redraw (design products unchanged)."""
    return cache.replace(mu=compute_mu(Z, chi, cache.Bnu, cache.BPhi))
