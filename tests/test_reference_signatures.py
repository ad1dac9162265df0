"""Reference-literal call signatures and return-list contract.

Ports the reference's roxygen example for the fitting pipeline call-for-call
(R/RcppExports.R example for BFMMM_Theta_est; UserFunctions.cpp:684) and
checks the returned named-list members (UserFunctions.cpp:327-336, :887-897)
in the reference's array layouts.
"""

import os

import numpy as np
import pytest

from bayesfmmm_tpu import reference_api as R
from bayesfmmm_tpu.io import armaio
from bayesfmmm_tpu.io.rds import read_rds

REF = "/root/reference/inst/test-data"


@pytest.fixture(scope="module")
def sim_data():
    if not os.path.isdir(REF):
        pytest.skip("reference fixtures not mounted")
    Y = read_rds(os.path.join(REF, "Sim_data.RDS"))
    T = read_rds(os.path.join(REF, "time.RDS"))
    return [np.asarray(y).ravel() for y in Y], [np.asarray(t).ravel()
                                                for t in T]


def test_roxygen_example_call_for_call(sim_data):
    """The reference's @examples block, transcribed 1:1 (positional)."""
    Y, time = sim_data
    tot_mcmc_iters = 150
    n_try = 1
    K = 2
    n_funct = 40
    basis_degree = 3
    n_eigen = 3
    boundary_knots = [0, 1000]
    internal_knots = [250, 500, 750]

    est1 = R.BFMMM_Nu_Z_multiple_try(tot_mcmc_iters, n_try, K, Y, time,
                                     n_funct, basis_degree, n_eigen,
                                     boundary_knots, internal_knots)
    est2 = R.BFMMM_Theta_est(tot_mcmc_iters, n_try, K, Y, time, n_funct,
                             basis_degree, n_eigen, boundary_knots,
                             internal_knots, est1)

    # phase-1 list members (UserFunctions.cpp:327-336), reference layout
    P = len(internal_knots) + basis_degree + 1
    assert est1["nu"].shape == (K, P, tot_mcmc_iters)
    assert est1["Z"].shape == (n_funct, K, tot_mcmc_iters)
    assert est1["pi"].shape == (K, tot_mcmc_iters)
    assert est1["alpha_3"].shape == (tot_mcmc_iters,)
    assert est1["sigma_sq"].shape == (tot_mcmc_iters,)
    assert est1["tau"].shape == (K, tot_mcmc_iters)
    assert est1["loglik"].shape == (tot_mcmc_iters,)
    B = est1["B"]
    assert len(B) == n_funct and B[0].shape[1] == P

    # phase-2 list members (UserFunctions.cpp:887-897)
    assert est2["Phi"].shape == (K, P, n_eigen, tot_mcmc_iters)
    assert est2["chi"].shape == (n_funct, n_eigen, tot_mcmc_iters)
    assert est2["gamma"].shape == (K, P, n_eigen, tot_mcmc_iters)
    assert est2["delta"].shape == (K, n_eigen, tot_mcmc_iters)
    assert est2["A"].shape == (K, 2, tot_mcmc_iters)
    assert np.isfinite(est2["loglik"]).all()


def test_theta_est_accepts_raw_reference_cubes():
    """The reference contract: multiple_try is a list with Z/nu cubes in
    (N, K, iters)/(K, P, iters) layout (UserFunctions.cpp:719-720) — here
    fed with the reference's own shipped Multivariate_trace."""
    d = os.path.join(REF, "Multivariate_trace")
    if not os.path.isdir(d):
        pytest.skip("fixtures not mounted")
    Y = np.asarray(read_rds(os.path.join(REF, "MVSim_data.RDS")))
    tr = armaio.load_trace_dir(d, names=["Nu", "Z"])
    Z_cube = np.moveaxis(tr["Z"], 0, -1)      # (N, K, iters) as arma stores
    nu_cube = np.moveaxis(tr["Nu"], 0, -1)    # (K, P, iters)

    est2 = R.BMVMMM_Theta_est(150, 1, 2, Y, 2,
                              {"Z": Z_cube, "nu": nu_cube})
    assert est2["Phi"].shape == (2, 10, 2, 150)
    assert est2["sigma_sq"].shape == (150,)
    assert np.isfinite(est2["loglik"]).all()
    # MV family: the stored/list tau is the inverse-Gamma variance
    # (UpdateTau.h:58) — reciprocal of the internal precision scale
    np.testing.assert_allclose(est2["tau"],
                               1.0 / np.moveaxis(
                                   np.asarray(est2.traces["tau"]), 0, -1),
                               rtol=1e-5)
    # MV lists carry no basis member
    with pytest.raises(KeyError):
        est2["B"]
