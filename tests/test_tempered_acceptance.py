"""Unit tests for the tempered-transition excursion acceptance.

Reference: CalculateTTAcceptance.h:65-97 (the up/down ladder bookkeeping)
and BFMMM.h:661-670 (the geometric ladder actually constructed by the
driver).  The logA computed inside ``tempered_excursion`` is checked
against a direct NumPy transcription of the reference's double loop, with
the rung states reproduced by a deterministic stub sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesfmmm_tpu.config import Priors
from bayesfmmm_tpu.samplers.drivers import (make_temperature_ladder,
                                            tempered_excursion)
from bayesfmmm_tpu.utils.simulate import simulate_functional

HP = Priors()


def test_ladder_matches_reference():
    """BFMMM.h:661-670: ones(N_t) with last entry pre-set to beta_N_t, then
    entries 1..N_t-1 overwritten by cumulative powers of beta_N_t^(1/N_t) —
    so [1, g, ..., g^(N_t-1)] for N_t > 1 and [beta_N_t] for N_t == 1."""
    np.testing.assert_allclose(
        np.asarray(make_temperature_ladder(0.5, 1)), [0.5])
    g = 0.5 ** (1.0 / 3.0)
    np.testing.assert_allclose(
        np.asarray(make_temperature_ladder(0.5, 3)), [1.0, g, g * g],
        rtol=1e-6)
    # reference replay of the construction loop
    for N_t, b in ((2, 0.3), (4, 0.7), (5, 0.05)):
        ref = np.ones(N_t)
        ref[N_t - 1] = b
        gm = b ** (1.0 / N_t)
        for i in range(1, N_t):
            ref[i] = ref[i - 1] * gm
        np.testing.assert_allclose(
            np.asarray(make_temperature_ladder(b, N_t)), ref, rtol=1e-6)


def _np_pzeta(beta_i, y, mask, B, state):
    """NumPy transcription of calculatePZeta (CalculateTTAcceptance.h:22-51):
    sum_{i,l} [-(beta/2) log sigma2 - (beta/(2 sigma2)) (y_il - mean_il)^2]."""
    Z = np.asarray(state.Z, np.float64)
    nu = np.asarray(state.nu, np.float64)
    Phi = np.asarray(state.Phi, np.float64)
    chi = np.asarray(state.chi, np.float64)
    s2 = float(state.sigma2)
    w = Z @ nu + np.einsum("nk,kpm,nm->np", Z, Phi, chi)
    mean = np.einsum("nlp,np->nl", np.asarray(B, np.float64), w)
    r2 = ((y - mean) ** 2 * mask).sum()
    n = mask.sum()
    return -(beta_i / 2.0) * n * np.log(s2) - (beta_i / (2.0 * s2)) * r2


def _np_tt_acceptance(ladder, states, y, mask, B):
    """NumPy transcription of CalculateTTAcceptance (:65-97)."""
    m = len(states) - 1               # = 2 * N_t
    logA = 0.0
    for i in range(len(ladder) - 1):
        logA += _np_pzeta(ladder[i + 1], y, mask, B, states[i])
        logA -= _np_pzeta(ladder[i], y, mask, B, states[i])
        logA -= _np_pzeta(ladder[i + 1], y, mask, B, states[m - i])
        logA += _np_pzeta(ladder[i], y, mask, B, states[m - i])
    return logA


def _stub_sweep(key, st, data, hp, c, beta=1.0):
    """Deterministic state perturbation (ignores the PRNG key) so the rung
    states can be replayed outside the excursion."""
    return st.replace(nu=st.nu * 1.05 + 0.2 * beta,
                      sigma2=st.sigma2 * (1.0 + 0.1 * beta))


def test_tt_log_acceptance_matches_reference():
    """tempered_excursion's logA == the reference double loop, replayed by
    hand on the same deterministic rung states (N_t = 3 ladder)."""
    data, truth = simulate_functional(seed=7, N=6, K=2, P=5, M=2,
                                      n_time=(8, 12), sigma2=0.5)
    N_t = 3
    ladder = make_temperature_ladder(0.25, N_t)
    c = jnp.full((2,), 10.0)

    _, accept, logA = jax.jit(
        lambda k, st: tempered_excursion(
            k, st, data, HP, c, ladder, covariate_mean=False,
            covariate_cov=False, sweep_fn=_stub_sweep))(
        jax.random.PRNGKey(3), truth)

    # Replay: rung l = 1..2N_t runs at ladder[temp_ind], temp_ind walking
    # 0..N_t-1 then back down (BFMMM.h:820-826 update rule).
    lad = np.asarray(ladder, np.float64)
    states = [truth]
    st = truth
    for l in range(1, 2 * N_t + 1):
        temp_ind = l - 1 if l <= N_t else 2 * N_t - l
        st = _stub_sweep(None, st, data, HP, c, beta=float(lad[temp_ind]))
        states.append(st)

    y = np.asarray(data.y, np.float64)
    mask = np.asarray(data.mask, np.float64)
    expected = _np_tt_acceptance(lad, states, y, mask, data.B)
    assert np.isfinite(expected)
    np.testing.assert_allclose(float(logA), expected,
                               rtol=2e-4, atol=2e-3)


def test_tt_accept_moves_to_endpoint():
    """An accepted excursion installs state S_{2N_t} wholesale; N_t=1 has an
    empty ladder sum so logA == 0 and the excursion accepts iff log u < 0
    (almost surely), matching the reference's N_t=1 always-accept."""
    data, truth = simulate_functional(seed=8, N=5, K=2, P=5, M=2,
                                      n_time=(8, 10), sigma2=0.5)
    ladder = make_temperature_ladder(0.5, 1)
    c = jnp.full((2,), 10.0)
    new_state, accept, logA = jax.jit(
        lambda k, st: tempered_excursion(
            k, st, data, HP, c, ladder, covariate_mean=False,
            covariate_cov=False, sweep_fn=_stub_sweep))(
        jax.random.PRNGKey(0), truth)
    assert float(logA) == 0.0
    assert bool(accept)
    # endpoint replay: two stub sweeps at beta_N_t
    st = truth
    for _ in range(2):
        st = _stub_sweep(None, st, data, HP, c, beta=0.5)
    np.testing.assert_allclose(np.asarray(new_state.nu), np.asarray(st.nu),
                               rtol=1e-5)
    np.testing.assert_allclose(float(new_state.sigma2), float(st.sigma2),
                               rtol=1e-5)
