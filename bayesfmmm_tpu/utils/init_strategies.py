"""Moment-based initialization for mixed membership structure.

The reference finds starting structure by brute force: serial random
restarts scored by log-likelihood (UserFunctions.cpp:302-325).  This module
adds a deterministic spectral/archetypal initializer exploiting the model's
geometry: with Z rows on the simplex, the smoothed observations live in the
convex hull of the K feature means, so

  1. ridge-project each observation onto the basis: c_i = (B_i'B_i + rI)^-1 B_i'y_i
  2. find K archetypes by furthest-point traversal in the PCA subspace
     (convex-hull extremes of the coefficient cloud),
  3. set nu_k to the archetype coefficients and Z by simplex-constrained
     least squares of c_i on {nu_k},
  4. initialize (chi, Phi) from an SVD of the residual coefficients.

All NumPy, host-side, O(N P^2) — negligible next to a single sweep.
"""

from __future__ import annotations

import numpy as np

__all__ = ["spectral_init", "simplex_lsq"]


def _project_coefficients(data, ridge=1e-6):
    """Per-observation ridge basis projections c (N, P)."""
    B = np.asarray(data.B, dtype=np.float64)
    y = np.asarray(data.y, dtype=np.float64)
    G = np.asarray(data.G, dtype=np.float64)
    P = B.shape[2]
    eye = np.eye(P)
    c = np.zeros((B.shape[0], P))
    rhs = np.einsum("nlp,nl->np", B, y)
    for i in range(B.shape[0]):
        scale = np.trace(G[i]) / P + 1.0
        c[i] = np.linalg.solve(G[i] + ridge * scale * eye, rhs[i])
    return c


def _furthest_point_archetypes(c, K):
    """Greedy convex-hull extreme selection (k-means++-style traversal)."""
    mean = c.mean(axis=0)
    idx = [int(np.argmax(np.linalg.norm(c - mean, axis=1)))]
    for _ in range(K - 1):
        d = np.min(
            np.stack([np.linalg.norm(c - c[j], axis=1) for j in idx]), axis=0)
        idx.append(int(np.argmax(d)))
    return np.array(idx)


def simplex_lsq(C, V, n_iter=200, lr=None):
    """Rows of Z solve min ||C - Z V||^2 s.t. Z rows on the simplex.

    Projected gradient with simplex projection (Duchi et al.), vectorized
    over rows.
    """
    N, P = C.shape
    K = V.shape[0]
    Z = np.full((N, K), 1.0 / K)
    G = V @ V.T                                   # (K, K)
    lip = np.linalg.eigvalsh(G).max() + 1e-9
    lr = lr or 1.0 / lip
    CVt = C @ V.T                                 # (N, K)

    def project_rows(Y):
        # Euclidean projection of each row onto the probability simplex
        u = np.sort(Y, axis=1)[:, ::-1]
        css = np.cumsum(u, axis=1) - 1.0
        ind = np.arange(1, K + 1)
        cond = u - css / ind > 0
        rho = K - np.argmax(cond[:, ::-1], axis=1) - 1
        theta = css[np.arange(N), rho] / (rho + 1.0)
        return np.maximum(Y - theta[:, None], 0.0)

    for _ in range(n_iter):
        grad = Z @ G - CVt
        Z = project_rows(Z - lr * grad)
    return Z


def spectral_init(data, K, M, *, ridge=1e-6, jitter=1e-3, seed=0):
    """Returns a dict of initial values {Z, nu, chi, Phi, sigma2}.

    Guaranteed valid: Z rows strictly inside the simplex (floored + re-
    normalized), sigma2 positive.
    """
    rng = np.random.default_rng(seed)
    c = _project_coefficients(data, ridge)
    P = c.shape[1]
    idx = _furthest_point_archetypes(c, K)
    nu = c[idx].copy()                            # (K, P)
    Z = simplex_lsq(c, nu)
    Z = np.clip(Z, 1e-4, None)
    Z = Z / Z.sum(axis=1, keepdims=True)

    resid = c - Z @ nu                            # (N, P)
    # residual SVD -> shared eigen directions, replicated per feature
    U, s, Vt = np.linalg.svd(resid, full_matrices=False)
    m_eff = min(M, len(s))
    chi = np.zeros((c.shape[0], M))
    chi[:, :m_eff] = U[:, :m_eff] * np.sqrt(c.shape[0])
    Phi = jitter * rng.normal(size=(K, P, M))
    for m in range(m_eff):
        Phi[:, :, m] += (s[m] / np.sqrt(c.shape[0])) * Vt[m][None, :]

    # residual variance of the fitted projection
    B = np.asarray(data.B, dtype=np.float64)
    mask = np.asarray(data.mask, dtype=np.float64)
    fit = np.einsum("nlp,np->nl", B, Z @ nu)
    rss = np.sum(((np.asarray(data.y) - fit) * mask) ** 2)
    sigma2 = max(rss / max(mask.sum(), 1.0), 1e-6)
    return {"Z": Z, "nu": nu, "chi": chi, "Phi": Phi, "sigma2": sigma2}
