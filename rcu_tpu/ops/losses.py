"""Training losses as pure JAX functions.

Parity targets:
- cross entropy:  torch F.cross_entropy used in reference common/trainloop/steps.py:36
- aleatoric loss: reference common/loss.py:7-26 (Kendall & Gal attenuation —
  Normal(logits, sigma), T rsamples, softmax-mean, NLL of target class)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray):
    """Mean softmax cross-entropy; class dim last, integer targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -jnp.mean(picked)


def aleatoric_loss(rng: jax.Array, logits: jnp.ndarray, sigma: jnp.ndarray,
                   target: jnp.ndarray, is_log_sigma: bool, nb_samples: int = 10):
    """Stochastic logit-noise NLL; class dim last.

    Draws ``nb_samples`` reparameterized logit samples from
    Normal(logits, sigma) (sigma = exp(input) when ``is_log_sigma``), averages
    the per-sample softmax, and takes the NLL of the target class — exactly the
    reference's AleatoricLoss but with the sample axis vmapped in one XLA
    program instead of a torch distribution loop.
    """
    std = jnp.exp(sigma) if is_log_sigma else sigma
    noise = jax.random.normal(rng, (nb_samples,) + logits.shape, logits.dtype)
    x_hat = logits[None] + std[None] * noise
    mc_expectation = jnp.mean(jax.nn.softmax(x_hat, axis=-1), axis=0)
    log_probs = jnp.log(mc_expectation)
    picked = jnp.take_along_axis(
        log_probs, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -jnp.mean(picked)
