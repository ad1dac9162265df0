"""Label-switching correction by permutation alignment.

Reference: LabelSwitch.h — ``GetDistanceZ`` (:7) and ``LabelSwitch``
(:16-60): align a draw's Z matrix to a reference Z by the permutation
minimizing the L1 distance.  (In the reference this is mostly superseded by
the post-processing "rescale" transform — summaries.rescale_transforms —
but kept as a standalone tool, as here.)
"""

from __future__ import annotations

import itertools

import numpy as np

__all__ = ["z_distance", "align_draw", "align_trace"]


def z_distance(Z_a: np.ndarray, Z_b: np.ndarray) -> float:
    """Sum of absolute differences (GetDistanceZ, LabelSwitch.h:7-14)."""
    return float(np.abs(np.asarray(Z_a) - np.asarray(Z_b)).sum())


def _permutations(K: int) -> np.ndarray:
    return np.array(list(itertools.permutations(range(K))), dtype=int)


def align_draw(Z: np.ndarray, Z_ref: np.ndarray, perms=None):
    """Best column permutation of Z against Z_ref; returns (perm, dist)."""
    K = Z.shape[1]
    perms = _permutations(K) if perms is None else np.asarray(perms)
    dists = np.abs(Z[:, perms] - Z_ref[:, None, :]).sum(axis=(0, 2))
    best = int(np.argmin(dists))
    return perms[best], float(dists[best])


def align_trace(traces: dict, Z_ref: np.ndarray | None = None) -> dict:
    """Permutation-align every draw of a trace dict to a reference Z.

    Applies the per-draw best permutation to all feature-indexed arrays
    (Z columns; nu/Phi/gamma/delta/A/eta/... leading feature axis; pi).
    Default reference: the final draw's Z.
    """
    Z_samp = np.asarray(traces["Z"])
    n_draws, N, K = Z_samp.shape
    Z_ref = Z_samp[-1] if Z_ref is None else np.asarray(Z_ref)
    perms = _permutations(K)
    out = {k: np.array(v, copy=True) for k, v in traces.items()}
    feature_leading = {"nu", "tau", "Phi", "gamma", "delta", "A", "eta",
                       "tau_eta", "xi", "gamma_xi", "delta_xi", "A_xi", "pi"}
    for d in range(n_draws):
        perm, _ = align_draw(Z_samp[d], Z_ref, perms)
        if np.array_equal(perm, np.arange(K)):
            continue
        out["Z"][d] = out["Z"][d][:, perm]
        if "chi" in out:
            pass  # chi is feature-free
        for name in feature_leading:
            if name in out and out[name].ndim >= 2 \
                    and out[name].shape[1] == K:
                out[name][d] = out[name][d][perm]
    return out
