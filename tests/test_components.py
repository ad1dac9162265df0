"""Component-inventory tests: HD family, label switching, legacy binary
kernels, reference-named API, observability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesfmmm_tpu import api
from bayesfmmm_tpu.config import ModelConfig, Priors
from bayesfmmm_tpu.models.state import make_hd_functional_data, init_state
from bayesfmmm_tpu.ops import legacy_binary
from bayesfmmm_tpu.post import label_switch
from bayesfmmm_tpu.utils import observability
from bayesfmmm_tpu.utils.simulate import simulate_functional

HP = Priors()


def test_hd_family_end_to_end():
    """BHDFMMM: 2-D surface data through the full pipeline (BFMMM.h:2892)."""
    rng = np.random.default_rng(71)
    N = 12
    # 6x6 grids on [0,1]^2
    g = np.linspace(0, 1, 6)
    pts = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    t_list = [pts for _ in range(N)]
    y_list = [np.sin(2 * np.pi * pts[:, 0]) * np.cos(np.pi * pts[:, 1])
              + 0.1 * rng.normal(size=pts.shape[0]) for _ in range(N)]
    data = make_hd_functional_data(
        y_list, t_list, basis_degrees=[2, 2],
        internal_knots_list=[np.array([0.5]), np.array([0.5])],
        boundary_knots=np.array([[0., 1.], [0., 1.]]))
    assert data.P == 16  # (1+2+1)^2
    # penalty is the graph penalty: annihilates constants
    np.testing.assert_allclose(
        np.asarray(data.pen) @ np.ones(16), 0.0, atol=1e-5)
    r1 = api.fit_nu_z(data=data, K=2, M=2, family="hd", tot_mcmc_iters=100,
                      n_try=1)
    r2 = api.fit_theta(r1, tot_mcmc_iters=100)
    r3 = api.fit_warm_start(r1, r2, tot_mcmc_iters=100)
    assert np.isfinite(np.asarray(r3.loglik)).all()
    assert np.mean(r3.loglik[-10:]) > np.mean(r1.loglik[:10])


def test_label_switch_alignment():
    rng = np.random.default_rng(5)
    Z_ref = rng.dirichlet(np.ones(3), size=20)
    perm = [2, 0, 1]
    Z_perm = Z_ref[:, perm]
    best, dist = label_switch.align_draw(Z_perm, Z_ref)
    # applying best permutation to columns of Z_perm recovers Z_ref
    np.testing.assert_allclose(Z_perm[:, best], Z_ref, atol=1e-12)
    assert dist < 1e-10


def test_label_switch_trace():
    rng = np.random.default_rng(6)
    nu = rng.normal(size=(4, 2, 5))
    Z = rng.dirichlet(np.ones(2), size=(4, 10))
    # swap features in draw 1
    Z_sw = Z.copy()
    Z_sw[1] = Z[1][:, ::-1]
    nu_sw = nu.copy()
    nu_sw[1] = nu[1][::-1]
    aligned = label_switch.align_trace(
        {"Z": Z_sw, "nu": nu_sw}, Z_ref=Z[1])
    np.testing.assert_allclose(aligned["Z"][1], Z[1], atol=1e-12)
    np.testing.assert_allclose(aligned["nu"][1], nu[1], atol=1e-12)


def test_legacy_binary_kernels():
    data, truth = simulate_functional(seed=72, N=12, K=2, P=5, M=1,
                                      n_time=(12, 15))
    cfg = ModelConfig(K=2, P=5, M=1)
    st = init_state(jax.random.PRNGKey(0), cfg, data)
    # binary membership state: one-hot rows, pi in (0,1)
    Z0 = jnp.eye(2)[jnp.arange(12) % 2].astype(jnp.float32)
    st = st.replace(Z=Z0, pi=jnp.asarray([0.5, 0.5]))
    for i in range(20):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        st = legacy_binary.update_z_binary(k1, st, data, rho=0.8)
        st = legacy_binary.update_pi_binary(k2, st)
    Z = np.asarray(st.Z)
    assert set(np.unique(Z)).issubset({0.0, 1.0})
    pi = np.asarray(st.pi)
    assert ((pi > 0) & (pi < 1)).all()


def test_reference_api_surface(tmp_path):
    """Every exported reference name exists and the trace-dir entry points
    run on a directory written by our exporter."""
    from bayesfmmm_tpu import reference_api as R
    ref_names = [
        "BFMMM_Nu_Z_multiple_try", "BFMMM_Theta_est", "BFMMM_warm_start",
        "BHDFMMM_Nu_Z_multiple_try", "BHDFMMM_Theta_est",
        "BHDFMMM_warm_start", "BMVMMM_Nu_Z_multiple_try", "BMVMMM_Theta_est",
        "BMVMMM_warm_start", "ConditionalPredictiveOrdinates", "FAIC",
        "FBIC", "FCovCI", "FDIC", "FLLik", "FMeanCI", "FSamplePaths",
        "HDFCovCI", "HDFMeanCI", "MVAIC", "MVBIC", "MVCovCI", "MVDIC",
        "MVLLik", "MVMeanCI", "ReadCube", "ReadFieldCube", "ReadFieldMat",
        "ReadFieldVec", "ReadMat", "ReadVec", "SigmaCI", "ZCI"]
    for name in ref_names:
        assert hasattr(R, name), name


def test_reference_api_postprocessing_on_fixtures():
    import os
    from bayesfmmm_tpu import reference_api as R
    d = "/root/reference/inst/test-data/Functional_trace/"
    if not os.path.isdir(d):
        pytest.skip("fixtures not mounted")
    t = np.linspace(0, 990, 25)
    ci = R.FMeanCI(d, 1, t, 3, [0, 1000], [250, 500, 750], k=1)
    assert ci["CI_50"].shape == (25,)
    zci = R.ZCI(d, 1)
    assert zci["CI_50"].shape == (40, 2)
    sci = R.SigmaCI(d, 1)
    assert sci["CI_50"] > 0
    cov = R.FCovCI(d, 1, t, t, 3, [0, 1000], [250, 500, 750], k=1, l=1)
    assert cov["CI_50"].shape == (25, 25)
    nu = R.ReadCube(os.path.join(d, "Nu0.txt"))
    assert nu.shape == (2, 7, 150)


def test_observability():
    msgs = []
    ps = observability.ProgressStream(every=10, printer=msgs.append)
    for i in range(20):
        ps.update(i, [float(i)])
    assert len(msgs) == 2 and "Log-likelihood" in msgs[0]
    data, truth = simulate_functional(seed=73, N=5, K=2, P=5, M=1,
                                      n_time=(8, 10))
    observability.assert_finite_state(truth)
    nu_bad = np.array(truth.nu)
    nu_bad[0, 0] = np.nan
    bad = truth.replace(nu=nu_bad)
    with pytest.raises(FloatingPointError):
        observability.assert_finite_state(bad)


def test_label_switch_trace_vectorized_k3():
    """align_trace is vectorized over draws (round-1: O(draws*K!) Python
    loop); K=3 with per-draw random permutations must be fully unwound."""
    rng = np.random.default_rng(7)
    n_draws, N, K, P = 200, 15, 3, 4
    Z = rng.dirichlet(np.ones(K), size=(1, N)).repeat(n_draws, axis=0)
    nu = rng.normal(size=(1, K, P)).repeat(n_draws, axis=0)
    Phi = rng.normal(size=(1, K, P, 2)).repeat(n_draws, axis=0)
    perms = np.stack([rng.permutation(K) for _ in range(n_draws)])
    Z_sw = np.take_along_axis(Z, perms[:, None, :], axis=2)
    nu_sw = np.take_along_axis(nu, perms[:, :, None], axis=1)
    Phi_sw = np.take_along_axis(Phi, perms[:, :, None, None], axis=1)
    aligned = label_switch.align_trace(
        {"Z": Z_sw, "nu": nu_sw, "Phi": Phi_sw}, Z_ref=Z[0], block=64)
    np.testing.assert_allclose(aligned["Z"], Z, atol=1e-12)
    np.testing.assert_allclose(aligned["nu"], nu, atol=1e-12)
    np.testing.assert_allclose(aligned["Phi"], Phi, atol=1e-12)
