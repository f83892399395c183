"""Depth sampling along rays: stratified, surface-guided, and inverse-CDF
importance sampling (pure JAX, static shapes).

Reference semantics: /root/reference/src/utils/Renderer.py:42-130 and
/root/reference/src/common.py:49-85. One deliberate fidelity note: the
reference's `sample_pdf` builds its CDF from *unnormalized* weights
(`pdf = weights` overrides the normalized value, common.py:55-56); we keep
that exact behavior behind `normalize=False` so importance samples match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def perturb_z_vals(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter of sorted z values within their mid-point intervals.

    Mirrors /root/reference/src/utils/Renderer.py:42-57.
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, det: bool = False,
               normalize: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling of `n_samples` new z values from per-bin weights.

    bins: (R, B) sorted bin centers; weights: (R, B). Mirrors
    /root/reference/src/common.py:49-85 including the unnormalized-CDF quirk
    (normalize=False): u ~ U[0,1] is inverted against cumsum(weights) whose
    total need not be 1.
    """
    if normalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, B+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,),
                               dtype=cdf.dtype)

    # searchsorted 'right' per row.
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def z_vals_with_depth(key: jax.Array, gt_depth: jnp.ndarray, truncation: float,
                      n_stratified: int, n_importance: int,
                      perturb: bool) -> jnp.ndarray:
    """Depth-guided z sampling for rays that have sensor depth.

    Per ray: `n_importance` "surface" samples spanning gt +- 1.5*truncation and
    `n_stratified` samples in [0, 1.2*gt], concatenated and sorted (then
    jittered). Mirrors /root/reference/src/utils/Renderer.py:86-101.

    gt_depth: (R,). Returns (R, n_stratified + n_importance).
    """
    dtype = gt_depth.dtype
    t_uni = jnp.linspace(0.0, 1.0, n_stratified, dtype=dtype)
    t_surf = jnp.linspace(0.0, 1.0, n_importance, dtype=dtype)
    gd = gt_depth[:, None]
    z_surface = gd - 1.5 * truncation + 3.0 * truncation * t_surf[None, :]
    z_free = 1.2 * gd * t_uni[None, :]
    z = jnp.sort(jnp.concatenate([z_free, z_surface], axis=-1), axis=-1)
    if perturb:
        z = perturb_z_vals(key, z)
    return z


def z_vals_uniform(key: jax.Array, far: jnp.ndarray, n_stratified: int,
                   perturb: bool) -> jnp.ndarray:
    """Uniform z sampling in [0, far] per ray (for depth-less rays).

    far: (R,) ray-AABB exit distance (+0.01 margin added by caller or here we
    follow the reference and add it). Mirrors Renderer.py:104-117.
    """
    dtype = far.dtype
    t_uni = jnp.linspace(0.0, 1.0, n_stratified, dtype=dtype)
    z = (far[:, None] + 0.01) * t_uni[None, :]
    if perturb:
        z = perturb_z_vals(key, z)
    return z
