"""Batched long-run sampling with background trace persistence.

Reference semantics (BFMMM.h:205-271, :1680-1746): the driver keeps a ring
of ``r_stored_iters`` draws; each time it fills, draws are thinned by
``thinning_num`` and appended as ``Param{q}.txt`` batch files, then the ring
resets.  The reference *blocks the sampler* on synchronous arma::save.

Here each batch is one jitted scan on the device; between batches the
thinned draws transfer to host and are handed to the native async writer
(io/native.AsyncTraceWriter) so file IO overlaps the next batch's compute.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from bayesfmmm_tpu.samplers import drivers


_EXPORT_LAYOUT = {
    # trace field -> reference file stem
    "nu": "Nu", "chi": "Chi", "pi": "Pi", "alpha3": "alpha_3", "A": "A",
    "delta": "Delta", "sigma2": "Sigma", "tau": "Tau", "gamma": "Gamma",
    "Phi": "Phi", "Z": "Z", "eta": "Eta", "tau_eta": "Tau_Eta", "xi": "Xi",
    "gamma_xi": "Gamma_Xi", "delta_xi": "Delta_Xi", "A_xi": "A_Xi",
}


def run_batched(key, state, data, hp, c, *, directory, tot_mcmc_iters,
                r_stored_iters, thinning_num=1, n_temp_trans=0,
                beta_N_t=1.0, N_t=1, covariate_mean=False,
                covariate_cov=False, family="functional",
                checkpoint_every=None, start_batch=0, progress=None,
                collapsed_z=False, gauge=False):
    """Run ``tot_mcmc_iters`` sweeps in ``r_stored_iters`` batches, saving
    each thinned batch in the reference's trace-file contract.

    ``progress``: a utils.observability.ProgressStream (or True for the
    default one) fed after every batch — the rolling-loglik print of
    BFMMM.h:870-875 at batch granularity.  The host loop between batches is
    also the cooperative interrupt point (Rcpp::checkUserInterrupt analog,
    BFMMM.h:203): Ctrl-C lands when the in-flight batch returns; the
    already-saved batch files and the latest checkpoint survive, so
    ``resume_batched`` can continue the run.

    Returns (final_state, loglik_full, n_batches).
    """
    from bayesfmmm_tpu.io import armaio
    from bayesfmmm_tpu.io.native import AsyncTraceWriter
    from bayesfmmm_tpu.utils.observability import ProgressStream

    if progress is True:
        progress = ProgressStream(every=1)
    os.makedirs(directory, exist_ok=True)
    n_batches = tot_mcmc_iters // r_stored_iters
    logliks = []
    writer = AsyncTraceWriter()
    try:
        for q0 in range(n_batches):
            q = start_batch + q0
            key, kb = jax.random.split(key)
            res = drivers.phase_warm_start(
                kb, state, data, hp, c, n_iters=r_stored_iters,
                thin=thinning_num, n_temp_trans=n_temp_trans,
                beta_N_t=beta_N_t, N_t=N_t, covariate_mean=covariate_mean,
                covariate_cov=covariate_cov, collapsed_z=collapsed_z,
                gauge=gauge)
            state = res.final_state
            logliks.append(np.asarray(res.loglik))
            _submit_batch(writer, directory, res.traces, q, family,
                          covariate_mean, covariate_cov)
            if checkpoint_every and (q0 + 1) % checkpoint_every == 0:
                from bayesfmmm_tpu.io.checkpoint import save_checkpoint
                save_checkpoint(os.path.join(directory, "checkpoint"),
                                state, key,
                                iteration=(q + 1) * r_stored_iters)
            if progress is not None:
                progress.update(q0, logliks[-1])
        failures = writer.flush()
        if failures:
            raise IOError(f"{failures} trace batch writes failed")
    finally:
        writer.close()
    return state, np.concatenate(logliks), n_batches


def _submit_batch(writer, directory, traces, q, family, covm, covc):
    """Thin host transfer + async submission of one batch's files."""
    from bayesfmmm_tpu.io import armaio

    host = {k: np.asarray(v) for k, v in traces.items()}
    tau = host["tau"]
    if family == "multivariate":
        tau = 1.0 / tau            # stored tau is the variance (UpdateTau.h:58)
    out = {
        "Nu": host["nu"], "Chi": host["chi"], "Pi": host["pi"],
        "alpha_3": host["alpha3"], "A": host["A"], "Delta": host["delta"],
        "Sigma": host["sigma2"], "Tau": tau, "Gamma": host["gamma"],
        "Phi": host["Phi"], "Z": host["Z"],
    }
    if covm and host["eta"].shape[-1] > 0:
        out["Eta"] = host["eta"]
        out["Tau_Eta"] = (1.0 / host["tau_eta"]
                          if family == "multivariate" else host["tau_eta"])
    if covc and host["xi"].shape[-2] > 0:
        out["Xi"] = host["xi"]
        out["Gamma_Xi"] = host["gamma_xi"]
        out["Delta_Xi"] = host["delta_xi"]
        out["A_Xi"] = host["A_xi"]
    # ascii formats go through the async writer; binary field formats are
    # written synchronously (they are the smaller minority of bytes)
    for name, arr in out.items():
        path = os.path.join(directory, f"{name}{q}.txt")
        kind = armaio._PLAIN_FILES.get(name)
        if kind in ("vec", "mat", "mat_iter_cols", "cube_iter_last"):
            disk = arr
            if kind == "mat_iter_cols":
                disk = arr.T
            writer.submit(path, disk)
        else:
            armaio.save_trace_dir(directory, {name: arr}, batch=q)


def resume_batched(directory, data, hp, c, *, additional_iters,
                   r_stored_iters, thinning_num=1, n_temp_trans=0,
                   beta_N_t=1.0, N_t=1, covariate_mean=False,
                   covariate_cov=False, family="functional",
                   checkpoint_every=1):
    """Exact-state resume of a batched run from its checkpoint.

    Continues the trace-file numbering after existing batches; the RNG key
    stored in the checkpoint makes the continuation trajectory identical to
    an uninterrupted run (capability the reference lacks — SURVEY.md §5).
    """
    from bayesfmmm_tpu.io.checkpoint import load_checkpoint

    state, key, it = load_checkpoint(os.path.join(directory, "checkpoint"))
    # count existing batches for file numbering
    q = 0
    while os.path.exists(os.path.join(directory, f"Nu{q}.txt")):
        q += 1
    # Cross-check the directory's batch count against the checkpoint's
    # stored iteration: a stale/mixed directory (files added or removed
    # since the checkpoint) would silently splice two different
    # trajectories' traces together.
    if q * r_stored_iters != it:
        raise ValueError(
            f"trace directory holds {q} batches but the checkpoint was "
            f"written at iteration {it} (expected "
            f"{it // r_stored_iters if r_stored_iters else 0} batches of "
            f"r_stored_iters={r_stored_iters}); the directory is stale or "
            "was written with a different r_stored_iters — refusing to mix "
            "trajectories")
    return run_batched(
        key, state, data, hp, c, directory=directory,
        tot_mcmc_iters=additional_iters, r_stored_iters=r_stored_iters,
        thinning_num=thinning_num, n_temp_trans=n_temp_trans,
        beta_N_t=beta_N_t, N_t=N_t, covariate_mean=covariate_mean,
        covariate_cov=covariate_cov, family=family,
        checkpoint_every=checkpoint_every, start_batch=q)
