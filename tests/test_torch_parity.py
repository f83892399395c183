"""Golden parity vs an independent PyTorch re-derivation of the reference
math (BASELINE.json: rendered RGB/depth and pixel gradients allclose to the
PyTorch reference).

The torch side below re-implements the REFERENCE formulas from their
published definitions (sdf2alpha + exclusive-cumprod compositing,
/root/reference/src/utils/Renderer.py:139-158; fs/center/tail SDF losses,
src/Tracker.py:113-147; unit-quaternion rotation) — written from the math,
not copied code — and torch.autograd provides the reference gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from unislam_tpu.core import losses as losses_lib
from unislam_tpu.core import pose as pose_lib
from unislam_tpu.render import renderer


def _torch_render(sdf, z_vals, rgb_raw, beta):
    """Reference compositing in torch: alpha = 1-exp(-b*sigmoid(-b*sdf));
    w_i = alpha_i * prod_{j<i}(1-alpha_j+1e-10); rgb/depth/unc sums."""
    alpha = 1.0 - torch.exp(-beta * torch.sigmoid(-sdf * beta))
    ones = torch.ones_like(alpha[..., :1])
    shifted = torch.cat([ones, 1.0 - alpha[..., :-1] + 1e-10], dim=-1)
    weights = alpha * torch.cumprod(shifted, dim=-1)
    rgb = torch.sum(weights[..., None] * rgb_raw, dim=-2)
    depth = torch.sum(weights * z_vals, dim=-1)
    term = torch.sum(weights, dim=-1)
    pixel_unc = (1.0 - term) ** 2
    depth_std = torch.sqrt(
        torch.sum(weights * (depth[..., None] - z_vals) ** 2, dim=-1))
    return rgb, depth, term, pixel_unc, depth_std, weights


def test_compositing_matches_torch_reference():
    R, S = 64, 40
    rng = np.random.default_rng(0)
    sdf = rng.normal(size=(R, S)).astype(np.float32) * 0.5
    z = np.sort(rng.uniform(0.1, 4.0, size=(R, S)).astype(np.float32), axis=1)
    rgb_raw = rng.uniform(size=(R, S, 3)).astype(np.float32)
    beta = 10.0

    t_rgb, t_depth, t_term, t_unc, t_std, _ = _torch_render(
        torch.tensor(sdf), torch.tensor(z), torch.tensor(rgb_raw),
        torch.tensor(beta))

    j_alpha = renderer.sdf2alpha(jnp.asarray(sdf), jnp.float32(beta))
    j_w = renderer._exclusive_cumprod_weights(j_alpha)
    j_rgb = jnp.sum(j_w[..., None] * jnp.asarray(rgb_raw), axis=-2)
    j_depth = jnp.sum(j_w * jnp.asarray(z), axis=-1)
    j_term = jnp.sum(j_w, axis=-1)
    j_unc = jnp.square(1.0 - j_term)
    j_std = jnp.sqrt(jnp.sum(j_w * jnp.square(j_depth[..., None]
                                              - jnp.asarray(z)), axis=-1))

    np.testing.assert_allclose(np.asarray(j_rgb), t_rgb.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_depth), t_depth.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_term), t_term.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_unc), t_unc.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_std), t_std.numpy(), atol=1e-4)


def test_pixel_gradients_match_torch_reference():
    """d(color+depth loss)/d(raw sdf, raw rgb) — the pixel-gradient parity
    check: our jax.grad against torch.autograd on identical math."""
    R, S = 32, 24
    rng = np.random.default_rng(1)
    sdf0 = (rng.normal(size=(R, S)) * 0.5).astype(np.float32)
    z = np.sort(rng.uniform(0.2, 3.0, size=(R, S)).astype(np.float32), axis=1)
    rgb0 = rng.uniform(0.1, 0.9, size=(R, S, 3)).astype(np.float32)
    gt_rgb = rng.uniform(size=(R, 3)).astype(np.float32)
    gt_d = rng.uniform(0.5, 2.5, size=(R,)).astype(np.float32)
    beta = 8.0

    # torch grads
    t_sdf = torch.tensor(sdf0, requires_grad=True)
    t_rgbr = torch.tensor(rgb0, requires_grad=True)
    rgb, depth, *_ = _torch_render(t_sdf, torch.tensor(z), t_rgbr,
                                   torch.tensor(beta))
    loss = torch.mean((rgb - torch.tensor(gt_rgb)) ** 2) \
        + 0.1 * torch.mean((depth - torch.tensor(gt_d)) ** 2)
    loss.backward()

    def j_loss(sdf, rgb_raw):
        alpha = renderer.sdf2alpha(sdf, jnp.float32(beta))
        w = renderer._exclusive_cumprod_weights(alpha)
        rgb = jnp.sum(w[..., None] * rgb_raw, axis=-2)
        depth = jnp.sum(w * jnp.asarray(z), axis=-1)
        return jnp.mean(jnp.square(rgb - jnp.asarray(gt_rgb))) \
            + 0.1 * jnp.mean(jnp.square(depth - jnp.asarray(gt_d)))

    g_sdf, g_rgb = jax.grad(j_loss, argnums=(0, 1))(jnp.asarray(sdf0),
                                                    jnp.asarray(rgb0))
    np.testing.assert_allclose(np.asarray(g_sdf), t_sdf.grad.numpy(),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(g_rgb), t_rgbr.grad.numpy(),
                               atol=2e-6)


def test_sdf_losses_match_torch_reference():
    """fs/center/tail region losses + gradients vs a torch re-derivation of
    Tracker.sdf_losses (masked-select means == our 0/1-weighted means)."""
    R, S = 40, 30
    rng = np.random.default_rng(2)
    sdf0 = (rng.normal(size=(R, S)) * 0.3).astype(np.float32)
    z = np.sort(rng.uniform(0.1, 3.0, size=(R, S)).astype(np.float32), axis=1)
    gt_d = rng.uniform(0.5, 2.5, size=(R,)).astype(np.float32)
    trunc = 0.06
    wf, wc, wt = 5.0, 200.0, 10.0

    t_sdf = torch.tensor(sdf0, requires_grad=True)
    t_z, t_d = torch.tensor(z), torch.tensor(gt_d)[:, None]
    front = t_z < (t_d - trunc)
    back = t_z > (t_d + trunc)
    center = (t_z > (t_d - 0.4 * trunc)) & (t_z < (t_d + 0.4 * trunc))
    tail = (~front) & (~back) & (~center)
    est = t_z + t_sdf * trunc
    t_loss = wf * torch.mean((t_sdf[front] - 1.0) ** 2) \
        + wc * torch.mean((est[center] - t_d.expand_as(est)[center]) ** 2) \
        + wt * torch.mean((est[tail] - t_d.expand_as(est)[tail]) ** 2)
    t_loss.backward()

    w = losses_lib.SdfLossWeights(wf, wc, wt)
    j_fn = lambda s: losses_lib.sdf_losses(s, jnp.asarray(z),
                                           jnp.asarray(gt_d),
                                           jnp.ones((R,)), trunc, w)
    j_loss = j_fn(jnp.asarray(sdf0))
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)
    g = jax.grad(j_fn)(jnp.asarray(sdf0))
    np.testing.assert_allclose(np.asarray(g), t_sdf.grad.numpy(), atol=1e-5)


def test_quaternion_matches_torch_reference():
    """quat->R against the standard unit-quaternion rotation formula in
    torch (what pytorch3d computes, /root/reference/src/common.py:196-208),
    including gradients through pose composition."""
    rng = np.random.default_rng(3)
    q0 = rng.normal(size=(8, 4)).astype(np.float32)

    def torch_quat_to_mat(q):
        q = q / q.norm(dim=-1, keepdim=True)
        w, x, y, z = q.unbind(-1)
        return torch.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ], dim=-1).reshape(-1, 3, 3)

    t_q = torch.tensor(q0, requires_grad=True)
    t_R = torch_quat_to_mat(t_q)
    t_R.sum().backward()

    j_R = pose_lib.quaternion_to_matrix(jnp.asarray(q0))
    np.testing.assert_allclose(np.asarray(j_R), t_R.detach().numpy(),
                               atol=1e-5)
    g = jax.grad(lambda q: jnp.sum(pose_lib.quaternion_to_matrix(q)))(
        jnp.asarray(q0))
    np.testing.assert_allclose(np.asarray(g), t_q.grad.numpy(), atol=1e-4)

    # roundtrip through matrix_to_quaternion (sign-canonicalized)
    q_rt = np.asarray(pose_lib.matrix_to_quaternion(j_R))
    q_n = q0 / np.linalg.norm(q0, axis=-1, keepdims=True)
    sign = np.sign(np.sum(q_rt * q_n, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_rt * sign, q_n, atol=1e-5)
