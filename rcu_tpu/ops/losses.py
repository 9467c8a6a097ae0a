"""Training losses as pure JAX functions.

Parity targets:
- cross entropy:  torch F.cross_entropy used in reference common/trainloop/steps.py:36
- aleatoric loss: reference common/loss.py:7-26 (Kendall & Gal attenuation —
  Normal(logits, sigma), T rsamples, softmax-mean, NLL of target class)

The ``*_log_probs`` functions return the PER-PIXEL log-probability of the
target class and are the single home of the formula — the train steps
(engine/steps.py) reduce them with the ``valid`` batch mask (CLAUDE.md:
every loss on padded batches must be valid-weighted), while the plain
``cross_entropy`` / ``aleatoric_loss`` means below are the unpadded-batch
convenience form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ce_log_probs(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel log-softmax probability of the target class; class dim last."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(
        logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray):
    """Mean softmax cross-entropy; class dim last, integer targets."""
    return -jnp.mean(ce_log_probs(logits, target))


def aleatoric_log_probs(rng: jax.Array, logits: jnp.ndarray, sigma: jnp.ndarray,
                        target: jnp.ndarray, is_log_sigma: bool,
                        nb_samples: int = 10) -> jnp.ndarray:
    """Per-pixel log MC-expectation probability of the target class.

    Draws ``nb_samples`` reparameterized logit samples from
    Normal(logits, sigma) (sigma = exp(input) when ``is_log_sigma``), averages
    the per-sample softmax, and picks the target class's log probability —
    exactly the reference's AleatoricLoss body but with the sample axis
    batched in one XLA program instead of a torch distribution loop.
    """
    std = jnp.exp(sigma) if is_log_sigma else sigma
    noise = jax.random.normal(rng, (nb_samples,) + logits.shape, logits.dtype)
    x_hat = logits[None] + std[None] * noise
    mc_expectation = jnp.mean(jax.nn.softmax(x_hat, axis=-1), axis=0)
    log_probs = jnp.log(mc_expectation)
    return jnp.take_along_axis(
        log_probs, target[..., None].astype(jnp.int32), axis=-1)[..., 0]


def aleatoric_loss(rng: jax.Array, logits: jnp.ndarray, sigma: jnp.ndarray,
                   target: jnp.ndarray, is_log_sigma: bool, nb_samples: int = 10):
    """Stochastic logit-noise NLL (mean over all pixels); class dim last."""
    return -jnp.mean(aleatoric_log_probs(rng, logits, sigma, target,
                                         is_log_sigma, nb_samples))
