"""Single-threaded NumPy reference sampler — the measured CPU baseline.

The reference publishes no benchmark numbers (BASELINE.md) and its Rcpp
sampler cannot run here (no R toolchain in the image), so the ≥10x ESS/s
target is measured against this sampler: the same Gibbs sweep, implemented
independently in vectorized single-thread NumPy/BLAS.  Vectorized NumPy is a
*stronger* baseline than the reference's scalar C++ loops (UpdateNu.h:42-63
etc. are element-wise accumulations), which makes the speedup claim
conservative.

Also doubles as a cross-implementation correctness oracle for the JAX
kernels (same conditionals, independent code).
"""

from __future__ import annotations

import numpy as np


class NumpyGibbs:
    """Functional/MV mixed membership Gibbs sampler, optionally with the
    covariate-adjusted mean (eta, UpdateEta.h:28-94) and covariance
    (xi + its MGP tower, UpdateXi.h / UpdateDelta.h:76-125) terms, so the
    covariate-adjusted benchmark configs have a measured CPU denominator."""

    def __init__(self, y, mask, B, pen, K, M, hp, seed=0, X=None,
                 with_eta=False, with_xi=False):
        self.y = y.astype(np.float64)
        self.mask = mask.astype(np.float64)
        self.B = (B * mask[:, :, None]).astype(np.float64)
        self.pen = pen.astype(np.float64)
        self.G = np.einsum("nlp,nlq->npq", self.B, self.B)
        self.K, self.M = K, M
        self.N, self.L, self.P = self.B.shape
        self.X = None if X is None else np.asarray(X, np.float64)
        self.D = 0 if self.X is None else self.X.shape[1]
        self.with_eta = bool(with_eta and self.D)
        self.with_xi = bool(with_xi and self.D)
        self.hp = hp
        self.rng = np.random.default_rng(seed)
        self.n_obs = self.mask.sum()

    def init_state(self):
        rng, K, P, M, N, D = self.rng, self.K, self.P, self.M, self.N, self.D
        pi = rng.dirichlet(np.full(K, 10.0))
        s = dict(
            Z=rng.dirichlet(100 * pi, size=N), pi=pi, alpha3=1.0,
            nu=rng.normal(size=(K, P)), tau=np.ones(K), sigma2=1.0,
            chi=rng.normal(size=(N, M)), Phi=rng.normal(size=(K, P, M)),
            gamma=np.ones((K, P, M)), delta=np.ones((K, M)),
            A=np.ones((K, 2)),
        )
        if self.with_eta:
            s["eta"] = rng.normal(size=(K, P, D))
            s["tau_eta"] = np.ones((K, D))
        if self.with_xi:
            s["xi"] = rng.normal(size=(K, P, D, M))
            s["gamma_xi"] = np.ones((K, P, D, M))
            s["delta_xi"] = np.ones((K, M, D))
            s["A_xi"] = np.ones((K, 2, D))
        return s

    # -- mean assembly -----------------------------------------------------
    def _products(self, s):
        Bnu = np.einsum("nlp,kp->nlk", self.B, s["nu"])
        if self.with_eta:
            Bnu = Bnu + np.einsum("nlp,kpd,nd->nlk", self.B, s["eta"], self.X)
        BPhi = np.einsum("nlp,kpm->nlkm", self.B, s["Phi"])
        if self.with_xi:
            BPhi = BPhi + np.einsum("nlp,kpdm,nd->nlkm",
                                    self.B, s["xi"], self.X)
        return Bnu, BPhi

    def _mu(self, s, Bnu, BPhi):
        return (np.einsum("nk,nlk->nl", s["Z"], Bnu)
                + np.einsum("nk,nm,nlkm->nl", s["Z"], s["chi"], BPhi))

    # -- kernels -----------------------------------------------------------
    def _mvn_prec(self, prec, b):
        jitter = 1e-10 * (np.trace(prec) / prec.shape[0] + 1.0)
        prec = prec + jitter * np.eye(prec.shape[0])
        Lc = np.linalg.cholesky(prec)
        mean = np.linalg.solve(prec, b)
        z = self.rng.normal(size=b.shape)
        return mean + np.linalg.solve(Lc.T, z)

    def update_z(self, s, Bnu, BPhi):
        C = Bnu + np.einsum("nm,nlkm->nlk", s["chi"], BPhi)
        a3pi = s["alpha3"] * s["pi"]

        def lp(Z):
            mu = np.einsum("nk,nlk->nl", Z, C)
            r = self.y - mu
            ll = -np.sum(r * r, axis=1) / (2 * s["sigma2"])
            with np.errstate(divide="ignore"):
                return ll + np.sum((a3pi - 1) * np.log(Z), axis=1)

        aZ = self.hp["a_Z_PM"]
        alpha_fwd = np.maximum(aZ * s["Z"], 1e-300)
        Znew = np.stack([self.rng.dirichlet(np.where(a <= 0, 10.0, a))
                         for a in alpha_fwd])
        from scipy.special import gammaln

        def qd(x, a):
            with np.errstate(divide="ignore"):
                return (np.sum((a - 1) * np.log(x), axis=1)
                        + gammaln(a.sum(axis=1)) - gammaln(a).sum(axis=1))

        with np.errstate(invalid="ignore"):
            la = lp(Znew) - lp(s["Z"]) \
                + qd(s["Z"], aZ * Znew) - qd(Znew, aZ * s["Z"])
        acc = (np.log(self.rng.uniform(size=self.N)) < np.nan_to_num(la, nan=-np.inf)) \
            | np.any(s["Z"] <= 0, axis=1)
        s["Z"] = np.where(acc[:, None], Znew, s["Z"])

    def update_nu(self, s, Bnu, BPhi):
        mu = self._mu(s, Bnu, BPhi)
        for j in range(self.K):
            zj = s["Z"][:, j]
            # Own term is the PURE B·nu_j contribution: with eta on, Bnu's
            # slice carries B·eta_j·x too, which must stay in the residual
            # (the reference subtracts the eta term for k==j as well,
            # UpdateNu.h:320 sits outside the k!=j guard).
            Bnu_j = (Bnu[:, :, j] if not self.with_eta
                     else np.einsum("nlp,p->nl", self.B, s["nu"][j]))
            own = zj[:, None] * Bnu_j
            r = self.y - mu + own
            prec = (np.einsum("n,npq->pq", zj * zj, self.G) / s["sigma2"]
                    + s["tau"][j] * self.pen)
            b = np.einsum("n,nl,nlp->p", zj, r, self.B) / s["sigma2"]
            nu_old = s["nu"][j].copy()
            s["nu"][j] = self._mvn_prec(prec, b)
            dB = np.einsum("nlp,p->nl", self.B, s["nu"][j] - nu_old)
            Bnu[:, :, j] += dB
            mu = mu + zj[:, None] * dB
        return mu

    def update_eta(self, s, mu):
        """Blocked Gibbs over (d, j) — UpdateEta.h:28-94 loop order.

        Only ``mu`` is kept incrementally consistent; the Bnu product is
        rebuilt at the top of each sweep and no later kernel reads it."""
        for d in range(self.D):
            for j in range(self.K):
                wt = s["Z"][:, j] * self.X[:, d]
                Be = np.einsum("nlp,p->nl", self.B, s["eta"][j, :, d])
                own = wt[:, None] * Be
                r = self.y - mu + own
                prec = (np.einsum("n,npq->pq", wt * wt, self.G) / s["sigma2"]
                        + s["tau_eta"][j, d] * self.pen)
                b = np.einsum("n,nl,nlp->p", wt, r, self.B) / s["sigma2"]
                s["eta"][j, :, d] = self._mvn_prec(prec, b)
                Be = np.einsum("nlp,p->nl", self.B, s["eta"][j, :, d])
                mu = mu - own + wt[:, None] * Be
        return mu

    def update_xi(self, s, BPhi, mu):
        """Blocked Gibbs over (j, m, d) — UpdateXi.h:26-93; keeps BPhi's
        (j, m) slice consistent for the chi update that follows."""
        for j in range(self.K):
            for m in range(self.M):
                for d in range(self.D):
                    wt = s["Z"][:, j] * s["chi"][:, m] * self.X[:, d]
                    Bx = np.einsum("nlp,p->nl", self.B, s["xi"][j, :, d, m])
                    own = wt[:, None] * Bx
                    r = self.y - mu + own
                    tilde = np.cumprod(s["delta_xi"][j, :, d])[m]
                    prec = (np.einsum("n,npq->pq", wt * wt, self.G)
                            / s["sigma2"]
                            + np.diag(tilde * s["gamma_xi"][j, :, d, m]))
                    b = np.einsum("n,nl,nlp->p", wt, r, self.B) / s["sigma2"]
                    xi_old = s["xi"][j, :, d, m].copy()
                    s["xi"][j, :, d, m] = self._mvn_prec(prec, b)
                    dB = np.einsum("nlp,p->nl", self.B,
                                   s["xi"][j, :, d, m] - xi_old)
                    BPhi[:, :, j, m] += self.X[:, d, None] * dB
                    mu = mu - own + wt[:, None] * (Bx + dB)
        return mu

    def update_xi_tower(self, s):
        """delta_xi / gamma_xi Gibbs (UpdateDelta.h:76-125,
        UpdateGamma.h:48-73); A_xi held fixed (MH, negligible cost)."""
        hp = self.hp
        # S[k, m, d] = sum_p gamma_xi * xi^2
        S = np.einsum("kpdm->kmd", s["gamma_xi"] * s["xi"] ** 2)
        for i in range(self.M):
            dxi = s["delta_xi"].copy()
            dxi[:, i, :] = 1.0
            cp = np.cumprod(dxi, axis=1)
            rate = 1.0 + 0.5 * np.sum(cp[:, i:, :] * S[:, i:, :], axis=1)
            shape = (s["A_xi"][:, 0, :] if i == 0 else s["A_xi"][:, 1, :]) \
                + self.P * (self.M - i) / 2
            s["delta_xi"][:, i, :] = self.rng.gamma(shape, 1.0) / rate
        tilde = np.cumprod(s["delta_xi"], axis=1)            # (K, M, D)
        rate = (hp["nu_1"] + np.einsum("kmd->kdm", tilde)[:, None]
                * s["xi"] ** 2) / 2
        s["gamma_xi"] = self.rng.gamma((hp["nu_1"] + 1) / 2, 1.0,
                                       size=rate.shape) / rate

    def update_phi(self, s, Bnu, BPhi, mu):
        tilde = np.cumprod(s["delta"], axis=1)
        for j in range(self.K):
            for m in range(self.M):
                w = s["Z"][:, j] * s["chi"][:, m]
                # Own term is the PURE B·Phi_jm contribution: with xi on,
                # BPhi's slice carries the X·B·xi part, which stays fixed in
                # this conditional and must remain in the residual; updating
                # BPhi incrementally (+= dB) preserves it for update_xi /
                # update_chi downstream.
                BPhi_jm = (BPhi[:, :, j, m] if not self.with_xi
                           else np.einsum("nlp,p->nl", self.B,
                                          s["Phi"][j, :, m]))
                own = w[:, None] * BPhi_jm
                r = self.y - mu + own
                prec = (np.einsum("n,npq->pq", w * w, self.G) / s["sigma2"]
                        + np.diag(tilde[j, m] * s["gamma"][j, :, m]))
                b = np.einsum("n,nl,nlp->p", w, r, self.B) / s["sigma2"]
                phi_old = s["Phi"][j, :, m].copy()
                s["Phi"][j, :, m] = self._mvn_prec(prec, b)
                dB = np.einsum("nlp,p->nl", self.B,
                               s["Phi"][j, :, m] - phi_old)
                BPhi[:, :, j, m] += dB
                mu = mu + w[:, None] * dB
        return mu

    def update_chi(self, s, BPhi, mu):
        F = np.einsum("nk,nlkm->nlm", s["Z"], BPhi)
        for m in range(self.M):
            own = s["chi"][:, m, None] * F[:, :, m]
            r = self.y - mu + own
            w = np.sum(F[:, :, m] * r, axis=1) / s["sigma2"]
            W = 1.0 + np.sum(F[:, :, m] ** 2, axis=1) / s["sigma2"]
            s["chi"][:, m] = w / W + self.rng.normal(size=self.N) / np.sqrt(W)
            mu = mu - own + s["chi"][:, m, None] * F[:, :, m]
        return mu

    def update_scalars(self, s, mu):
        hp = self.hp
        # tau
        quad = np.einsum("kp,pq,kq->k", s["nu"], self.pen, s["nu"])
        s["tau"] = self.rng.gamma(hp["alpha_nu"] + self.P / 2, 1.0) \
            / (hp["beta_nu"] + 0.5 * quad)
        # tau_eta (UpdateTau.h:75-95 conjugate Gamma per (k, d))
        if self.with_eta:
            quad = np.einsum("kpd,pq,kqd->kd", s["eta"], self.pen, s["eta"])
            s["tau_eta"] = self.rng.gamma(
                hp["alpha_eta"] + self.P / 2, 1.0, size=quad.shape) \
                / (hp["beta_eta"] + 0.5 * quad)
        # sigma2
        rss = np.sum((self.y - mu) ** 2)
        s["sigma2"] = (hp["beta_0"] + rss / 2) \
            / self.rng.gamma(hp["alpha_0"] + self.n_obs / 2, 1.0)
        # delta (MGP)
        S = np.sum(s["gamma"] * s["Phi"] ** 2, axis=1)
        for i in range(self.M):
            d = s["delta"].copy()
            d[:, i] = 1.0
            cp = np.cumprod(d, axis=1)
            rate = 1.0 + 0.5 * np.sum(cp[:, i:] * S[:, i:], axis=1)
            shape = (s["A"][:, 0] if i == 0 else s["A"][:, 1]) \
                + self.P * (self.M - i) / 2
            s["delta"][:, i] = self.rng.gamma(shape, 1.0) / rate
        # gamma
        tilde = np.cumprod(s["delta"], axis=1)
        rate = (hp["nu_1"] + tilde[:, None, :] * s["Phi"] ** 2) / 2
        s["gamma"] = self.rng.gamma((hp["nu_1"] + 1) / 2, 1.0,
                                    size=rate.shape) / rate

    def sweep(self, s):
        Bnu, BPhi = self._products(s)
        self.update_z(s, Bnu, BPhi)
        mu = self.update_nu(s, Bnu, BPhi)
        if self.with_eta:
            mu = self.update_eta(s, mu)
        mu = self.update_phi(s, Bnu, BPhi, mu)
        if self.with_xi:
            mu = self.update_xi(s, BPhi, mu)
            self.update_xi_tower(s)
        mu = self.update_chi(s, BPhi, mu)
        self.update_scalars(s, mu)
        return s

    def run(self, n_iters, collect=("nu", "sigma2")):
        s = self.init_state()
        out = {k: [] for k in collect}
        for _ in range(n_iters):
            s = self.sweep(s)
            for k in collect:
                out[k].append(np.copy(s[k]))
        return {k: np.stack(v) for k, v in out.items()}, s
