"""Photometric losses: L1 + SSIM (the 3DGS training objective).

The reference has no training at all (forward-only viewer); this implements the
standard 3DGS loss  L = (1−λ)·L1 + λ·(1−SSIM)  with λ=0.2, against which the
framework's analytic gradients are exercised end-to-end.

SSIM is the 11×11 Gaussian-windowed variant, implemented as depthwise
convolutions — XLA maps these onto the MXU and, under SPMD sharding of the
image, inserts the halo exchanges automatically, so the same code serves the
single-chip and sharded training paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(img: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 2D filter on an (H, W, C) image with SAME padding."""
    c = img.shape[-1]
    x = img[None].transpose(0, 3, 1, 2)  # NCHW
    w = jnp.broadcast_to(window[None, None], (c, 1, *window.shape))  # OIHW depthwise
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y[0].transpose(1, 2, 0)


def ssim(a: jax.Array, b: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair, data range 1.0."""
    w = jnp.asarray(_gaussian_window(window_size))
    c1 = 0.01**2
    c2 = 0.03**2

    mu_a = _filter2d(a, w)
    mu_b = _filter2d(b, w)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _filter2d(a * a, w) - mu_aa
    sigma_bb = _filter2d(b * b, w) - mu_bb
    sigma_ab = _filter2d(a * b, w) - mu_ab

    s = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    )
    return jnp.mean(s)


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def photometric_loss(
    pred: jax.Array, target: jax.Array, ssim_weight: float = 0.2
) -> jax.Array:
    """(1−λ)·L1 + λ·(1−SSIM), the 3DGS objective."""
    if ssim_weight == 0.0:
        return l1(pred, target)
    return (1.0 - ssim_weight) * l1(pred, target) + ssim_weight * (
        1.0 - ssim(pred, target)
    )
