"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesfmmm_tpu.ops import pallas_kernels as pk


def test_fused_mean_rss_matches_einsum():
    rng = np.random.default_rng(0)
    N, L, P = 13, 24, 6          # deliberately non-tile-aligned
    B = jnp.asarray(rng.normal(size=(N, L, P)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(N, L)), jnp.float32)
    mu, rss = pk.fused_mean_rss(B, w, y, tile_n=4)
    mu_ref = jnp.einsum("nlp,np->nl", B, w)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=2e-5, atol=2e-5)
    rss_ref = float(jnp.sum((y - mu_ref) ** 2))
    assert abs(float(rss) - rss_ref) < 1e-2


def test_fused_mean_rss_masked_padding():
    """Padded rows (zero B and y) contribute exactly zero to the RSS."""
    rng = np.random.default_rng(1)
    N, L, P = 6, 16, 4
    B = np.asarray(rng.normal(size=(N, L, P)), np.float32)
    y = np.asarray(rng.normal(size=(N, L)), np.float32)
    B[:, 10:, :] = 0.0
    y[:, 10:] = 0.0
    w = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    mu, rss = pk.fused_mean_rss(jnp.asarray(B), w, jnp.asarray(y))
    assert np.allclose(np.asarray(mu)[:, 10:], 0.0)
    rss_ref = float(np.sum((y - np.asarray(mu)) ** 2))
    assert abs(float(rss) - rss_ref) < 1e-3


def test_weighted_gram_matches_einsum():
    rng = np.random.default_rng(2)
    N, P = 21, 8
    G = jnp.asarray(rng.normal(size=(N, P, P)), jnp.float32)
    wt = jnp.asarray(rng.uniform(size=(N,)), jnp.float32)
    out = pk.weighted_gram(G, wt, tile_n=8)
    ref = jnp.einsum("n,npq->pq", wt, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
