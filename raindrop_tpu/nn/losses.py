"""Probabilistic / per-timestep losses from the mTAND tier.

jnp equivalents of the reference's mTAND loss utilities
(code/baselines/mTAND/utils.py): masked Gaussian log-density, diagonal
Gaussian KL, masked MSE, the ELBO terms of the encoder-decoder mTAND
variant (compute_losses, utils.py:107-123), and the per-timestep
cross-entropy used for activity classification (compute_pertp_loss,
utils.py:818-829). All pure jnp and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import log_softmax

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def log_normal_pdf(x, mean, logvar, mask):
    """Elementwise masked Gaussian log-density
    (reference mTAND/utils.py:29-33)."""
    return -0.5 * (_LOG_2PI + logvar + (x - mean) ** 2 / jnp.exp(logvar)) * mask


def normal_kl(mu1, lv1, mu2, lv2):
    """Elementwise KL(N(mu1, e^lv1) || N(mu2, e^lv2))
    (reference mTAND/utils.py:35-42)."""
    v1, v2 = jnp.exp(lv1), jnp.exp(lv2)
    return lv2 / 2.0 - lv1 / 2.0 + (v1 + (mu1 - mu2) ** 2) / (2.0 * v2) - 0.5


def masked_mse(orig, pred, mask):
    """sum((orig-pred)^2 * mask) / sum(mask)
    (reference mTAND/utils.py:45-48)."""
    return jnp.sum((orig - pred) ** 2 * mask) / jnp.sum(mask)


def vae_elbo_terms(dim, batch, qz0_mean, qz0_logvar, pred_x,
                   noise_std: float, normalize: bool = False):
    """Per-sample (log p(x|z), KL(q(z0|x) || N(0, I))) for the mTAND
    encoder-decoder (reference compute_losses, mTAND/utils.py:107-123).

    batch: [B, L, >=2*dim] — values cols :dim, observed mask cols dim:2dim.
    qz0_mean/qz0_logvar: latent posterior stats, any shape [B, ...].
    pred_x: decoder reconstruction [B, L, dim].
    normalize: divide both terms by the per-sample observation count
    (the reference's args.norm flag).
    """
    observed = batch[:, :, :dim]
    mask = batch[:, :, dim:2 * dim]
    noise_logvar = jnp.full_like(pred_x, 2.0 * jnp.log(noise_std))
    logpx = log_normal_pdf(observed, pred_x, noise_logvar, mask)
    logpx = logpx.sum(axis=(-1, -2))
    kl = normal_kl(qz0_mean, qz0_logvar,
                   jnp.zeros_like(qz0_mean), jnp.zeros_like(qz0_logvar))
    kl = kl.reshape(kl.shape[0], -1).sum(axis=-1)
    if normalize:
        denom = mask.sum(axis=(-1, -2))
        logpx = logpx / denom
        kl = kl / denom
    return logpx, kl


def per_timestep_ce(label_predictions, true_label_onehot, mask):
    """Masked per-timestep cross-entropy (reference compute_pertp_loss,
    mTAND/utils.py:818-829): timesteps with no observation in any feature
    are excluded; labels arrive one-hot and are argmaxed.

    DELIBERATE DEVIATION from the reference: compute_pertp_loss has a
    broadcasting bug — it multiplies a [N] CE vector by a [N,1] mask,
    producing an [N,N] matrix, so its "masked mean" actually evaluates to
    the UNMASKED sum of CE divided by the mask count: invalid timesteps
    still contribute loss. We compute the intended masked mean
    (sum(ce*valid)/sum(valid)), so loss curves are not numerically
    comparable to reference mTAND runs on this objective. See
    DEVIATIONS.md.

    label_predictions: [B, L, C] logits; true_label_onehot: [B, L, C];
    mask: [B, L, D] observation mask.
    """
    B, L, C = label_predictions.shape
    logits = label_predictions.reshape(B * L, C)
    target = jnp.argmax(true_label_onehot.reshape(B * L, C), axis=-1)
    valid = (mask.sum(-1) > 0).reshape(B * L).astype(logits.dtype)
    ce = -jnp.take_along_axis(log_softmax(logits, axis=-1),
                              target[:, None], axis=-1)[:, 0]
    return jnp.sum(ce * valid) / jnp.sum(valid)
