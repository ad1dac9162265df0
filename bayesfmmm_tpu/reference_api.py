"""1:1 reference-named API surface.

Every function exported by the reference R package (NAMESPACE:3-35) has a
same-named equivalent here, so a BayesFMMM user can map their workflow
directly.  Post-processing entry points take a trace *directory* and file
count exactly like the reference (PostProcessing.cpp signatures); fitting
entry points accept the reference's argument names and dispatch to the
unified pipeline (api.py).  Family-specific mirrors (MV*/HDF*) differ only
in how the basis/penalty is constructed — the unified implementations
underneath are identical, matching the reference's near-duplicated C++.
"""

from __future__ import annotations

import numpy as np

from bayesfmmm_tpu import api, basis
from bayesfmmm_tpu.io import armaio
from bayesfmmm_tpu.models.state import make_functional_data
from bayesfmmm_tpu.post import model_selection, predictive, summaries

__all__ = [
    "BFMMM_Nu_Z_multiple_try", "BFMMM_Theta_est", "BFMMM_warm_start",
    "BHDFMMM_Nu_Z_multiple_try", "BHDFMMM_Theta_est", "BHDFMMM_warm_start",
    "BMVMMM_Nu_Z_multiple_try", "BMVMMM_Theta_est", "BMVMMM_warm_start",
    "FMeanCI", "FCovCI", "ZCI", "SigmaCI", "FDIC", "FAIC", "FBIC", "FLLik",
    "ConditionalPredictiveOrdinates", "FSamplePaths",
    "MVMeanCI", "MVCovCI", "MVDIC", "MVAIC", "MVBIC", "MVLLik",
    "HDFMeanCI", "HDFCovCI",
    "ReadVec", "ReadMat", "ReadCube", "ReadFieldVec", "ReadFieldMat",
    "ReadFieldCube",
]


# ---------------------------------------------------------------------------
# Fitting (UserFunctions.cpp:166, :684, :1341 and MV/HD mirrors)
# ---------------------------------------------------------------------------

def _priors_from_kwargs(kw):
    """Map the reference's named hyperparameters (UserFunctions.cpp:176-193,
    :700: b, alpha1l, ..., alpha_0, beta_0, nu_1, c) onto a Priors config.
    Unknown names raise, matching the R call-signature contract."""
    from dataclasses import fields

    from bayesfmmm_tpu.config import Priors

    valid = {f.name for f in fields(Priors)}
    unknown = set(kw) - valid
    if unknown:
        raise TypeError(f"unknown hyperparameter(s): {sorted(unknown)}")
    c = kw.pop("c", None)
    if c is not None:
        kw["c"] = tuple(np.asarray(c, dtype=float).ravel())
    return Priors(**kw).validate()


def BFMMM_Nu_Z_multiple_try(tot_mcmc_iters, n_try, K, Y, time, n_funct,
                            basis_degree, n_eigen, boundary_knots,
                            internal_knots, X=None, **priors):
    return api.fit_nu_z(Y, time, K=K, M=n_eigen,
                        tot_mcmc_iters=tot_mcmc_iters, n_try=n_try, X=X,
                        family="functional", basis_degree=basis_degree,
                        internal_knots=internal_knots,
                        boundary_knots=boundary_knots,
                        priors=_priors_from_kwargs(priors))


def BFMMM_Theta_est(tot_mcmc_iters, n_try, nu_z_result, n_eigen=None,
                    cov_adj=False, **priors):
    return api.fit_theta(nu_z_result, tot_mcmc_iters=tot_mcmc_iters,
                         n_try=max(n_try, 1), M=n_eigen,
                         covariate_cov=cov_adj,
                         priors=_priors_from_kwargs(priors))


def BFMMM_warm_start(tot_mcmc_iters, nu_z_result, theta_result,
                     thinning_num=1, r_stored_iters=None, dir=None,
                     n_temp_trans=0, beta_N_t=1.0, N_t=1, burnin_prop=0.8,
                     **priors):
    return api.fit_warm_start(nu_z_result, theta_result,
                              tot_mcmc_iters=tot_mcmc_iters,
                              thinning_num=thinning_num,
                              burnin_prop=burnin_prop,
                              n_temp_trans=n_temp_trans, beta_N_t=beta_N_t,
                              N_t=N_t, directory=dir,
                              r_stored_iters=r_stored_iters,
                              priors=_priors_from_kwargs(priors))


def BMVMMM_Nu_Z_multiple_try(tot_mcmc_iters, n_try, K, Y, n_eigen, X=None,
                             **priors):
    return api.fit_nu_z(Y, K=K, M=n_eigen, tot_mcmc_iters=tot_mcmc_iters,
                        n_try=n_try, X=X, family="multivariate",
                        priors=_priors_from_kwargs(priors))


BMVMMM_Theta_est = BFMMM_Theta_est
BMVMMM_warm_start = BFMMM_warm_start


def BHDFMMM_Nu_Z_multiple_try(tot_mcmc_iters, n_try, K, Y, time, n_funct,
                              basis_degree, n_eigen, boundary_knots,
                              internal_knots, X=None, **priors):
    return api.fit_nu_z(Y, time, K=K, M=n_eigen,
                        tot_mcmc_iters=tot_mcmc_iters, n_try=n_try, X=X,
                        family="hd", basis_degrees=basis_degree,
                        internal_knots_list=internal_knots,
                        boundary_knots=boundary_knots,
                        priors=_priors_from_kwargs(priors))


BHDFMMM_Theta_est = BFMMM_Theta_est
BHDFMMM_warm_start = BFMMM_warm_start


# ---------------------------------------------------------------------------
# Post-processing on trace directories (PostProcessing.cpp)
# ---------------------------------------------------------------------------

def _nu_z_from_dir(dir, n_files):
    tr = armaio.load_trace_dir(dir, names=["Nu", "Z"], n_files=n_files)
    return tr["Nu"], tr["Z"]


def FMeanCI(dir, n_files, time, basis_degree, boundary_knots, internal_knots,
            k, alpha=0.05, rescale=True, simultaneous=False,
            burnin_prop=0.1, X=None, trans_mats=None):
    """PostProcessing.cpp:99."""
    nu, Z = _nu_z_from_dir(dir, n_files)
    B = basis.bspline_basis(np.asarray(time).ravel(), basis_degree,
                            np.asarray(internal_knots),
                            np.asarray(boundary_knots))
    eta = x = None
    if X is not None:
        eta = armaio.load_trace_dir(dir, names=["Eta"],
                                    n_files=n_files)["Eta"]
        x = np.asarray(X).ravel()
    return summaries.mean_ci(nu, B, k, alpha=alpha, rescale=rescale,
                             simultaneous=simultaneous,
                             burnin_prop=burnin_prop, Z_samp=Z,
                             trans_mats=trans_mats, eta_samp=eta, x=x)


def MVMeanCI(dir, n_files, k=None, alpha=0.05, rescale=True,
             simultaneous=False, burnin_prop=0.1, X=None, trans_mats=None):
    """PostProcessing.cpp:806 — identity basis."""
    nu, Z = _nu_z_from_dir(dir, n_files)
    B = np.eye(nu.shape[2])
    out = {}
    ks = [k] if k is not None else range(1, nu.shape[1] + 1)
    for kk in ks:
        out[kk] = summaries.mean_ci(nu, B, kk, alpha=alpha, rescale=rescale,
                                    simultaneous=simultaneous,
                                    burnin_prop=burnin_prop, Z_samp=Z,
                                    trans_mats=trans_mats)
    return out[k] if k is not None else out


def HDFMeanCI(dir, n_files, time, basis_degree, boundary_knots,
              internal_knots, k, alpha=0.05, rescale=True,
              simultaneous=False, burnin_prop=0.1, trans_mats=None):
    """PostProcessing.cpp:1410 — tensor basis at (n, dim) query points."""
    nu, Z = _nu_z_from_dir(dir, n_files)
    B = basis.tensor_bspline_basis(np.asarray(time), basis_degree,
                                   internal_knots,
                                   np.asarray(boundary_knots))
    return summaries.mean_ci(nu, B, k, alpha=alpha, rescale=rescale,
                             simultaneous=simultaneous,
                             burnin_prop=burnin_prop, Z_samp=Z,
                             trans_mats=trans_mats)


def FCovCI(dir, n_files, time1, time2, basis_degree, boundary_knots,
           internal_knots, k, l, alpha=0.05, rescale=True,
           simultaneous=False, burnin_prop=0.1, X=None, trans_mats=None):
    """PostProcessing.cpp:1781."""
    tr = armaio.load_trace_dir(dir, names=["Phi", "Z"], n_files=n_files)
    B1 = basis.bspline_basis(np.asarray(time1).ravel(), basis_degree,
                             np.asarray(internal_knots),
                             np.asarray(boundary_knots))
    B2 = basis.bspline_basis(np.asarray(time2).ravel(), basis_degree,
                             np.asarray(internal_knots),
                             np.asarray(boundary_knots))
    xi = x = None
    if X is not None:
        xi_tr = armaio.load_trace_dir(dir, names=["Xi"], n_files=n_files)
        if "Xi" in xi_tr:
            xi = xi_tr["Xi"]
            x = np.asarray(X).ravel()
    return summaries.cov_ci(tr["Phi"], B1, B2, k, l, alpha=alpha,
                            rescale=rescale, simultaneous=simultaneous,
                            burnin_prop=burnin_prop, Z_samp=tr["Z"],
                            trans_mats=trans_mats, xi_samp=xi, x=x)


def MVCovCI(dir, n_files, k, l, alpha=0.05, rescale=True,
            simultaneous=False, burnin_prop=0.1, trans_mats=None):
    """PostProcessing.cpp:2468 — identity basis."""
    tr = armaio.load_trace_dir(dir, names=["Phi", "Z"], n_files=n_files)
    B = np.eye(tr["Phi"].shape[2])
    return summaries.cov_ci(tr["Phi"], B, B, k, l, alpha=alpha,
                            rescale=rescale, simultaneous=simultaneous,
                            burnin_prop=burnin_prop, Z_samp=tr["Z"],
                            trans_mats=trans_mats)


def HDFCovCI(dir, n_files, time1, time2, basis_degree, boundary_knots,
             internal_knots, k, l, alpha=0.05, rescale=True,
             simultaneous=False, burnin_prop=0.1, trans_mats=None):
    """PostProcessing.cpp:3097 — tensor basis."""
    tr = armaio.load_trace_dir(dir, names=["Phi", "Z"], n_files=n_files)
    B1 = basis.tensor_bspline_basis(np.asarray(time1), basis_degree,
                                    internal_knots,
                                    np.asarray(boundary_knots))
    B2 = basis.tensor_bspline_basis(np.asarray(time2), basis_degree,
                                    internal_knots,
                                    np.asarray(boundary_knots))
    return summaries.cov_ci(tr["Phi"], B1, B2, k, l, alpha=alpha,
                            rescale=rescale, simultaneous=simultaneous,
                            burnin_prop=burnin_prop, Z_samp=tr["Z"],
                            trans_mats=trans_mats)


def ZCI(dir, n_files, alpha=0.05, burnin_prop=0.1):
    """PostProcessing.cpp:3505."""
    tr = armaio.load_trace_dir(dir, names=["Z"], n_files=n_files)
    return summaries.z_ci(tr["Z"], alpha=alpha, burnin_prop=burnin_prop)


def SigmaCI(dir, n_files, alpha=0.05, burnin_prop=0.1):
    """PostProcessing.cpp:3435."""
    tr = armaio.load_trace_dir(dir, names=["Sigma"], n_files=n_files)
    return summaries.sigma_ci(tr["Sigma"], alpha=alpha,
                              burnin_prop=burnin_prop)


def _traces_and_data_from_dir(dir, n_files, Y, time=None, basis_degree=None,
                              boundary_knots=None, internal_knots=None):
    names = ["Nu", "Phi", "Z", "Chi", "Sigma", "Eta", "Xi"]
    tr = armaio.load_trace_dir(dir, names=names, n_files=n_files)
    traces = {"nu": tr["Nu"], "Phi": tr["Phi"], "Z": tr["Z"],
              "chi": tr["Chi"], "sigma2": tr["Sigma"]}
    if "Eta" in tr:
        # disk eta field cubes are (iters, D?, P, ...) — stored via our
        # exporter as (iters, K, P, D)
        traces["eta"] = tr["Eta"]
    if "Xi" in tr:
        traces["xi"] = tr["Xi"]
    if time is not None:
        data = make_functional_data(
            [np.asarray(y).ravel() for y in Y],
            [np.asarray(t).ravel() for t in time],
            basis_degree=basis_degree, internal_knots=internal_knots,
            boundary_knots=boundary_knots)
    else:
        from bayesfmmm_tpu.models.state import make_multivariate_data
        data = make_multivariate_data(np.asarray(Y))
    return traces, data


def FDIC(dir, n_files, basis_degree, boundary_knots, internal_knots, time,
         Y, X=None, cov_adj=False, burnin_prop=0.1):
    """PostProcessing.cpp:3762-3784."""
    traces, data = _traces_and_data_from_dir(dir, n_files, Y, time,
                                             basis_degree, boundary_knots,
                                             internal_knots)
    return model_selection.dic(traces, data, burnin_prop=burnin_prop, X=X)


def FAIC(dir, n_files, basis_degree, boundary_knots, internal_knots, time,
         Y, X=None, cov_adj=False, burnin_prop=0.1):
    traces, data = _traces_and_data_from_dir(dir, n_files, Y, time,
                                             basis_degree, boundary_knots,
                                             internal_knots)
    return model_selection.aic(traces, data, burnin_prop=burnin_prop, X=X,
                               cov_adj=cov_adj)


def FBIC(dir, n_files, basis_degree, boundary_knots, internal_knots, time,
         Y, X=None, cov_adj=False, burnin_prop=0.1):
    traces, data = _traces_and_data_from_dir(dir, n_files, Y, time,
                                             basis_degree, boundary_knots,
                                             internal_knots)
    return model_selection.bic(traces, data, burnin_prop=burnin_prop, X=X,
                               cov_adj=cov_adj)


def FLLik(dir, n_files, basis_degree, boundary_knots, internal_knots, time,
          Y, X=None, cov_adj=False):
    """PostProcessing.cpp:4892 — per-draw log-likelihood trace."""
    traces, data = _traces_and_data_from_dir(dir, n_files, Y, time,
                                             basis_degree, boundary_knots,
                                             internal_knots)
    return model_selection.loglik_trace(traces, data, X=X)


def MVDIC(dir, n_files, Y, X=None, cov_adj=False, burnin_prop=0.1):
    traces, data = _traces_and_data_from_dir(dir, n_files, Y)
    return model_selection.dic(traces, data, burnin_prop=burnin_prop, X=X)


def MVAIC(dir, n_files, Y, X=None, cov_adj=False, burnin_prop=0.1):
    traces, data = _traces_and_data_from_dir(dir, n_files, Y)
    return model_selection.aic(traces, data, burnin_prop=burnin_prop, X=X,
                               cov_adj=cov_adj)


def MVBIC(dir, n_files, Y, X=None, cov_adj=False, burnin_prop=0.1):
    traces, data = _traces_and_data_from_dir(dir, n_files, Y)
    return model_selection.bic(traces, data, burnin_prop=burnin_prop, X=X,
                               cov_adj=cov_adj)


def MVLLik(dir, n_files, Y, X=None, cov_adj=False):
    traces, data = _traces_and_data_from_dir(dir, n_files, Y)
    return model_selection.loglik_trace(traces, data, X=X)


def ConditionalPredictiveOrdinates(dir, n_files, basis_degree,
                                   boundary_knots, internal_knots, time, Y,
                                   X=None, burnin_prop=0.1):
    """PostProcessing.cpp:6339 / CalculateLikelihood.h:344-386."""
    traces, data = _traces_and_data_from_dir(dir, n_files, Y, time,
                                             basis_degree, boundary_knots,
                                             internal_knots)
    return model_selection.cpo(traces, data, burnin_prop=burnin_prop, X=X)


def FSamplePaths(dir, n_files, basis_degree, boundary_knots, internal_knots,
                 time, Y, alpha=0.05, burnin_prop=0.1, X=None,
                 mean_adj=False, cov_adj=False):
    """PostProcessing.cpp:6599."""
    traces, data = _traces_and_data_from_dir(dir, n_files, Y, time,
                                             basis_degree, boundary_knots,
                                             internal_knots)
    return predictive.sample_paths(traces, data, alpha=alpha,
                                   burnin_prop=burnin_prop, X=X)


# ---------------------------------------------------------------------------
# Trace readers (UserFunctions.cpp:2158-2351)
# ---------------------------------------------------------------------------

def ReadVec(path):
    return armaio.load_arma(path).ravel()


def ReadMat(path):
    return armaio.load_arma(path)


def ReadCube(path):
    """Returns (rows, cols, slices) layout like arma — our loader is
    slices-first, so transpose for API parity."""
    c = armaio.load_arma(path)
    return np.transpose(c, (1, 2, 0))


def ReadFieldVec(path):
    out = armaio.load_arma(path)
    return [np.asarray(o).ravel() for o in out]


def ReadFieldMat(path):
    out = armaio.load_arma(path)
    return [np.asarray(o) for o in out]


def ReadFieldCube(path):
    out = armaio.load_arma(path)
    return [np.transpose(np.asarray(o), (1, 2, 0)) for o in out]
