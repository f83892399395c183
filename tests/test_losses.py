"""Masked losses vs a direct boolean-indexing reference implementation
(the semantics of /root/reference/src/Tracker.py:113-147)."""

import jax.numpy as jnp
import numpy as np

from unislam_tpu.core import losses


def reference_sdf_losses(sdf, z_vals, gt_depth, trunc, w):
    """Numpy re-statement of the reference's masked-mean formulas."""
    gd = gt_depth[:, None]
    front = z_vals < gd - trunc
    back = z_vals > gd + trunc
    center = (z_vals > gd - 0.4 * trunc) & (z_vals < gd + 0.4 * trunc)
    tail = ~front & ~back & ~center
    est = z_vals + sdf * trunc
    fs = np.square(sdf[front] - 1).mean() if front.any() else 0.0
    c = np.square(est[center] - np.broadcast_to(gd, z_vals.shape)[center]).mean() if center.any() else 0.0
    t = np.square(est[tail] - np.broadcast_to(gd, z_vals.shape)[tail]).mean() if tail.any() else 0.0
    return w.fs * fs + w.center * c + w.tail * t


def test_sdf_losses_match_boolean_indexing():
    rng = np.random.default_rng(0)
    R, N = 64, 40
    gt = rng.uniform(1.0, 4.0, size=R).astype(np.float32)
    z = np.sort(rng.uniform(0.0, 5.0, size=(R, N)).astype(np.float32), axis=-1)
    sdf = rng.uniform(-1, 1, size=(R, N)).astype(np.float32)
    w = losses.SdfLossWeights(fs=10.0, center=200.0, tail=50.0)
    ours = float(losses.sdf_losses(jnp.asarray(sdf), jnp.asarray(z),
                                   jnp.asarray(gt), jnp.ones(R), 0.06, w))
    ref = reference_sdf_losses(sdf, z, gt, 0.06, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_sdf_losses_ray_mask_drops_rays():
    rng = np.random.default_rng(1)
    R, N = 32, 16
    gt = rng.uniform(1.0, 4.0, size=R).astype(np.float32)
    z = np.sort(rng.uniform(0.0, 5.0, size=(R, N)).astype(np.float32), axis=-1)
    sdf = rng.uniform(-1, 1, size=(R, N)).astype(np.float32)
    w = losses.SdfLossWeights(fs=1.0, center=1.0, tail=1.0)
    mask = np.zeros(R); mask[:10] = 1
    ours = float(losses.sdf_losses(jnp.asarray(sdf), jnp.asarray(z),
                                   jnp.asarray(gt), jnp.asarray(mask), 0.06,
                                   w))
    ref = reference_sdf_losses(sdf[:10], z[:10], gt[:10], 0.06, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_masked_median_matches_torch_convention():
    x = jnp.asarray([5.0, 1.0, 3.0, 2.0, 9.0, 7.0])
    m = jnp.asarray([1, 1, 1, 1, 0, 0], dtype=bool)
    # masked values {5,1,3,2}: torch.median -> lower middle = 2
    assert float(losses.masked_median(x, m)) == 2.0
    m2 = jnp.ones(6, dtype=bool)
    # {1,2,3,5,7,9} -> lower middle = 3
    assert float(losses.masked_median(x, m2)) == 3.0


def test_color_depth_losses():
    gt = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    pred = jnp.asarray([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0]])
    full = float(losses.color_loss(gt, pred, jnp.ones(2)))
    np.testing.assert_allclose(full, (0.25 + 0.25) / 6, rtol=1e-6)
    half = float(losses.color_loss(gt, pred, jnp.asarray([1.0, 0.0])))
    np.testing.assert_allclose(half, 0.25 / 3, rtol=1e-6)
    d = float(losses.depth_loss(jnp.asarray([2.0, 3.0]),
                                jnp.asarray([2.5, 3.0]),
                                jnp.asarray([1.0, 1.0])))
    np.testing.assert_allclose(d, 0.125, rtol=1e-6)
