"""Exact-state checkpoint / resume for the sampler.

The reference has NO exact-state resume: its two mechanisms are batch trace
persistence (BFMMM.h:205-271) and warm-starting from point estimates
(UserFunctions.cpp:1557-1650) — RNG state is lost (SURVEY.md §5).  Here a
checkpoint captures the full sampler state pytree *and* the PRNG key, so a
resumed chain continues the exact same trajectory.

Uses Orbax when available (sharded, async-capable, multi-host-safe);
falls back to a plain npz for minimal environments.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from bayesfmmm_tpu.models.state import GibbsState

_FIELDS = [f.name for f in GibbsState.__dataclass_fields__.values()]


def save_checkpoint(path: str, state, key, iteration: int = 0,
                    extra: dict | None = None) -> None:
    """Save (state, key, iteration) — exact-resume contract.

    A path ending in ``.npz`` requests the plain-npz format explicitly;
    any other path tries Orbax (which writes a directory) first and falls
    back to ``path + '.npz'``."""
    try:
        if path.endswith(".npz"):
            raise ImportError("npz format requested")
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckpt = {
            "state": {f: getattr(state, f) for f in _FIELDS},
            "key": jax.random.key_data(key) if jax.dtypes.issubdtype(
                key.dtype, jax.dtypes.prng_key) else key,
            "iteration": np.asarray(iteration),
        }
        if extra:
            ckpt["extra"] = extra
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, ckpt, force=True)
    except (ImportError, Exception):
        arrs = {f"state__{f}": np.asarray(getattr(state, f)) for f in _FIELDS}
        kd = key
        try:
            kd = jax.random.key_data(key)
        except Exception:
            pass
        arrs["key"] = np.asarray(kd)
        arrs["iteration"] = np.asarray(iteration)
        np.savez(path if path.endswith(".npz") else path + ".npz", **arrs)


def load_checkpoint(path: str, dtype=None):
    """Returns (state, key, iteration)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    npz = path if path.endswith(".npz") else path + ".npz"
    # a directory named *.npz is an Orbax checkpoint, not an npz archive
    if os.path.isfile(npz):
        z = np.load(npz)
        fields = {f: jnp.asarray(z[f"state__{f}"], dtype) for f in _FIELDS}
        state = GibbsState(**fields)
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
        return state, key, int(z["iteration"])
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckpt = ckptr.restore(os.path.abspath(path))
    fields = {f: jnp.asarray(ckpt["state"][f], dtype) for f in _FIELDS}
    state = GibbsState(**fields)
    key = jax.random.wrap_key_data(jnp.asarray(ckpt["key"]))
    return state, key, int(ckpt["iteration"])
