"""Ray generation, pixel sampling, pdf sampling, z-value samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from unislam_tpu.core import rays as rays_lib
from unislam_tpu.core import sampling

INTR = rays_lib.Intrinsics(H=48, W=64, fx=80.0, fy=80.0, cx=31.5, cy=23.5)


def test_camera_ray_dirs_opengl_convention():
    dirs = np.asarray(rays_lib.camera_ray_dirs(INTR))
    assert dirs.shape == (48, 64, 3)
    # center pixel looks straight down -z
    np.testing.assert_allclose(dirs[23, 31], [-0.5 / 80, 0.5 / 80, -1.0],
                               atol=1e-6)
    # +x to the right, +y up (row 0 is top -> positive y)
    assert dirs[0, 63][0] > 0 and dirs[0, 63][1] > 0
    np.testing.assert_allclose(dirs[..., 2], -1.0)


def test_get_rays_identity_pose():
    c2w = jnp.eye(4)
    rays_o, rays_d = rays_lib.get_rays(INTR, c2w)
    np.testing.assert_allclose(np.asarray(rays_o), 0.0)
    np.testing.assert_allclose(np.asarray(rays_d),
                               np.asarray(rays_lib.camera_ray_dirs(INTR)),
                               atol=1e-6)


def test_get_rays_rotated_pose():
    # 90 deg rotation about +y: camera -z maps to world -x
    c2w = jnp.asarray([
        [0, 0, 1, 2.0],
        [0, 1, 0, 0.5],
        [-1, 0, 0, -1.0],
        [0, 0, 0, 1.0],
    ], dtype=jnp.float32)
    rays_o, rays_d = rays_lib.get_rays(INTR, c2w)
    np.testing.assert_allclose(np.asarray(rays_o[0, 0]), [2.0, 0.5, -1.0],
                               atol=1e-6)
    center = np.asarray(rays_d[23, 31])
    np.testing.assert_allclose(center[0], -1.0, atol=0.01)


def test_sample_pixels_in_region_and_correct_values():
    depth = jnp.arange(48 * 64, dtype=jnp.float32).reshape(48, 64)
    color = jnp.stack([depth, depth * 2, depth * 3], axis=-1)
    i, j, d, c = rays_lib.sample_pixels(jax.random.PRNGKey(0), 500, 10, 40, 5,
                                        60, depth, color)
    i, j = np.asarray(i), np.asarray(j)
    assert (i >= 5).all() and (i < 60).all()
    assert (j >= 10).all() and (j < 40).all()
    np.testing.assert_allclose(np.asarray(d), j * 64 + i, atol=0)
    np.testing.assert_allclose(np.asarray(c[:, 1]), (j * 64 + i) * 2, atol=0)


def test_ray_aabb_far_axis_rays():
    bound = jnp.asarray([[-1.0, 2.0], [-1.0, 1.0], [-3.0, 1.0]])
    rays_o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[1.0, 1e-8, 1e-8], [-1e-8, -1e-8, -1.0]])
    far = np.asarray(rays_lib.ray_aabb_far(rays_o, rays_d, bound))
    np.testing.assert_allclose(far, [2.0, 3.0], rtol=1e-4)


def test_sample_pdf_concentrates_mass():
    """Samples must land in high-weight bins (unnormalized-CDF semantics)."""
    R, B = 4, 32
    bins = jnp.tile(jnp.linspace(0.0, 1.0, B), (R, 1))
    weights = jnp.zeros((R, B - 1)).at[:, 10].set(5.0)  # mass near z~0.33
    s = sampling.sample_pdf(jax.random.PRNGKey(1), bins, weights, 16)
    s = np.asarray(s)
    assert s.shape == (R, 16)
    lo, hi = bins[0, 9], bins[0, 12]
    # with total mass 5 > 1, all u in [0,1] invert inside the massive bin
    assert ((s >= float(lo)) & (s <= float(hi))).mean() > 0.95


def test_sample_pdf_det_uniform_weights():
    R, B = 2, 9
    bins = jnp.tile(jnp.linspace(0.0, 1.0, B), (R, 1))
    weights = jnp.ones((R, B - 1)) / (B - 1)  # normalized: cdf hits 1
    s = np.asarray(sampling.sample_pdf(jax.random.PRNGKey(2), bins, weights,
                                       5, det=True))
    np.testing.assert_allclose(s[0], np.linspace(0.0, 1.0, 5), atol=1e-5)


def test_z_vals_with_depth_structure():
    gt = jnp.asarray([2.0, 4.0])
    z = sampling.z_vals_with_depth(jax.random.PRNGKey(0), gt, truncation=0.1,
                                   n_stratified=32, n_importance=8,
                                   perturb=False)
    z = np.asarray(z)
    assert z.shape == (2, 40)
    assert (np.diff(z, axis=-1) >= 0).all()
    # surface samples cover gt +- 1.5*trunc
    assert (np.abs(z - 2.0) < 0.151).any(axis=-1)[0]
    assert z[0].max() <= max(1.2 * 2.0, 2.0 + 0.15) + 1e-5
    assert z[1].max() <= max(1.2 * 4.0, 4.0 + 0.15) + 1e-5


def test_perturb_stays_in_interval():
    z = jnp.tile(jnp.linspace(0.0, 1.0, 16), (4, 1))
    zp = np.asarray(sampling.perturb_z_vals(jax.random.PRNGKey(3), z))
    assert (zp >= 0.0).all() and (zp <= 1.0).all()
    assert (np.diff(zp, axis=-1) > -1e-6).all()
