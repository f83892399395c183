"""Renderer: compositing math vs closed form, sampling branches, gradients."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from unislam_tpu.models import hash_encoding as he
from unislam_tpu.models import scene as scene_lib
from unislam_tpu.render import renderer


def tiny_scene():
    spec = he.make_spec(n_levels=4, n_features=2, log2_hashmap_size=8,
                        base_resolution=4, desired_resolution=32)
    sc = scene_lib.SceneConfig(
        sdf_spec=spec, color_spec=spec,
        bound=np.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]],
                         dtype=np.float32),
        truncation=0.1)
    params = scene_lib.init_params(jax.random.PRNGKey(0), sc)
    return sc, params


def test_sdf2alpha_closed_form():
    sdf = jnp.asarray([-1.0, 0.0, 1.0])
    a = np.asarray(renderer.sdf2alpha(sdf, jnp.float32(10.0)))
    expect = 1 - np.exp(-10.0 / (1 + np.exp(np.asarray([-10.0, 0.0, 10.0]))))
    np.testing.assert_allclose(a, expect, rtol=1e-4, atol=1e-6)
    # deep inside surface (sdf<<0) -> opaque; far outside -> transparent
    assert a[0] > 0.99 and a[2] < 0.01


def test_weights_exclusive_cumprod():
    alpha = jnp.asarray([[0.5, 0.5, 1.0]])
    w = np.asarray(renderer._exclusive_cumprod_weights(alpha))[0]
    np.testing.assert_allclose(
        w, [0.5, 0.5 * (0.5 + 1e-10), (0.5 + 1e-10) ** 2], rtol=1e-5)


def test_render_shapes_and_uncertainty_identities():
    sc, params = tiny_scene()
    rc = renderer.RenderConfig(n_stratified=16, n_importance=4, perturb=True)
    R = 64
    key = jax.random.PRNGKey(1)
    rays_o = jnp.zeros((R, 3))
    d = jax.random.normal(key, (R, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    gt_depth = jnp.full((R,), 1.5)
    out = renderer.render_rays(params, sc, rc, rays_o, rays_d, gt_depth, key)
    S = 20
    assert out.sdf.shape == (R, S) and out.z_vals.shape == (R, S)
    assert out.rgb.shape == (R, 3) and out.depth.shape == (R,)
    np.testing.assert_allclose(
        np.asarray(out.pixel_unc),
        np.square(1 - np.asarray(out.termination_prob)), rtol=1e-5)
    assert (np.asarray(out.rgb) >= 0).all() and (np.asarray(out.rgb) <= 1).all()
    assert (np.diff(np.asarray(out.z_vals), axis=-1) >= -1e-6).all()


def test_render_mixed_depth_branch():
    """Rays without sensor depth take the importance-sampling branch."""
    sc, params = tiny_scene()
    rc = renderer.RenderConfig(n_stratified=16, n_importance=4, perturb=False)
    rays_o = jnp.zeros((8, 3))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
    gt_depth = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0])
    out = renderer.render_rays(params, sc, rc, rays_o, rays_d, gt_depth,
                               jax.random.PRNGKey(2))
    z = np.asarray(out.z_vals)
    # depth rays: max z <= 1.2 * gt; no-depth rays: up to the bound exit (~2)
    assert z[0].max() <= 1.2 + 1e-4
    assert z[1].max() > 1.5
    assert np.isfinite(np.asarray(out.depth)).all()


def test_render_gradients_wrt_params_and_pose():
    sc, params = tiny_scene()
    rc = renderer.RenderConfig(n_stratified=8, n_importance=4, perturb=False)
    rays_d = jnp.tile(jnp.asarray([[0.577, 0.577, -0.577]]), (16, 1))
    gt_depth = jnp.full((16,), 1.0)

    def loss_params(p):
        out = renderer.render_rays(p, sc, rc, jnp.zeros((16, 3)), rays_d,
                                   gt_depth, jax.random.PRNGKey(0))
        return jnp.mean(out.depth) + jnp.mean(out.rgb)

    g = jax.grad(loss_params)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0

    def loss_origin(o):
        out = renderer.render_rays(params, sc, rc,
                                   jnp.broadcast_to(o, (16, 3)), rays_d,
                                   gt_depth, jax.random.PRNGKey(0))
        return jnp.mean(out.depth)

    go = jax.grad(loss_origin)(jnp.zeros(3))
    assert np.isfinite(np.asarray(go)).all()


def test_render_img_chunking():
    sc, params = tiny_scene()
    rc = renderer.RenderConfig(n_stratified=8, n_importance=4, perturb=False,
                               ray_batch_size=512)
    from unislam_tpu.core.rays import Intrinsics
    intr = Intrinsics(H=20, W=30, fx=25.0, fy=25.0, cx=14.5, cy=9.5)
    gt = np.full((20, 30), 1.0, dtype=np.float32)
    depth, rgb, term, unc, dstd = renderer.render_img(
        params, sc, rc, intr, np.eye(4, dtype=np.float32),
        jax.random.PRNGKey(0), gt_depth=gt)
    assert depth.shape == (20, 30) and rgb.shape == (20, 30, 3)
    assert np.isfinite(np.asarray(depth)).all()
