"""Whole-model HMC with spectral initialization — the gradient-based path."""

import numpy as np

from bayesfmmm_tpu import api
from bayesfmmm_tpu.utils.simulate import simulate_functional


def main():
    data, truth = simulate_functional(seed=2, N=30, K=2, P=6, M=2)
    res = api.fit_hmc(data, K=2, M=2, n_warmup=400, n_samples=400,
                      n_chains=4, n_leapfrog=24)
    print("accept rates:", res.hmc_diagnostics["accept_mean"].round(2))
    print("step sizes:", res.hmc_diagnostics["eps"].round(4))
    est = res.estimates(burnin_prop=0.2)
    print("sigma2 estimate:", float(est["sigma2"]),
          "(truth", float(truth.sigma2), ")")


if __name__ == "__main__":
    main()
