"""Differentiable volume renderer: depth-guided sampling + SDF alpha
compositing + uncertainty outputs, as one pure function.

TPU-native rewrite of /root/reference/src/utils/Renderer.py:21-223. The same
function backs both optimization phases — tracking differentiates it w.r.t.
the 7-dof pose, mapping w.r.t. the scene pytree — exactly the architecture
the reference implements with two torch autograd wirings.

Design deltas for XLA:
- Static shapes: every ray in the (R,)-batch gets S = n_stratified +
  n_importance samples. Per-ray depth / no-depth branches (Renderer.py:86-130)
  become a `jnp.where` select; the depth-less importance-sampling probe runs
  under `lax.cond` so it costs nothing when every ray has sensor depth.
- The probe is gradient-stopped (the reference runs it under torch.no_grad).
- PRNG is explicit (`key`), so perturbation/importance draws are reproducible
  and shard cleanly.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from unislam_tpu.core import rays as rays_lib
from unislam_tpu.core import sampling
from unislam_tpu.models import scene as scene_lib
from unislam_tpu.models.scene import SceneConfig


class RenderConfig(NamedTuple):
    n_stratified: int = 32
    n_importance: int = 8
    perturb: bool = True
    ray_batch_size: int = 10000
    # Surface-LOD (brick encoding only): query the hashed fine levels for
    # only the n_fine samples per ray nearest the (sensor or probe) depth;
    # 0 disables (all levels on all samples); -1 queries COARSE LEVELS ONLY
    # (no fine anywhere — coarse-to-fine tracking, see scene.query_coarse).
    n_fine: int = 0
    # which levels count as "fine" (brick_encoding.coarse_fine_split):
    # "cost" = gather/scatter-served levels only (tracking-safe);
    # "hashed" = every spatially-hashed level incl. matmul-hashed ones
    # (mapping: removes their off-band gather+scatter rows per iteration).
    lod_split: str = "cost"
    # how the n_fine samples are chosen: "depth" = nearest the sensor (or
    # probe) depth along the ray — mapping's choice, it defines the band
    # that gets trained; "field" = nearest the coarse field's zero
    # crossing (scene.query_lod_field) — tracking's choice, pose-
    # independent so a wrong hypothesis still reads the trained band.
    lod_select: str = "depth"
    # narrower band for the NON-finest fine levels: they get only the
    # n_fine_mid nearest samples (0 = same band as the finest level). A mid
    # level's bricks are ~6x coarser than the band's sample spacing, so the
    # extra samples mostly re-gather/re-scatter the same rows — per-row
    # scatter cost is the mapping step's biggest line item (round-3 trace).
    n_fine_mid: int = 0
    # backward scatter-row dedup for the band groups (0 = off): same-brick
    # band samples' table-gradient rows are run-length-merged per ray to at
    # most ceil(K * dedup_band) scatter rows (scene._dedup_groups /
    # brick_encoding._dedup_rows). Exact for rays whose band crosses
    # <= ceil(K * dedup_band) bricks; overflow rays drop the farthest-z
    # runs' TABLE gradient only (pose/points grads stay per-sample exact).
    dedup_band: float = 0.0


class RenderOutput(NamedTuple):
    """Field names follow Renderer.render_batch_ray's returns
    (/root/reference/src/utils/Renderer.py:152)."""
    termination_prob: jnp.ndarray   # (R,)  sum of weights
    pixel_unc: jnp.ndarray          # (R,)  (1 - sum w)^2
    depth: jnp.ndarray              # (R,)
    rgb: jnp.ndarray                # (R, 3)
    sdf: jnp.ndarray                # (R, S)
    z_vals: jnp.ndarray             # (R, S)
    depth_std: jnp.ndarray          # (R,)  rendered depth uncertainty


def sdf2alpha(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """alpha = 1 - exp(-beta * sigmoid(-beta * sdf)) (Renderer.py:154-158)."""
    return 1.0 - jnp.exp(-beta * jax.nn.sigmoid(-sdf * beta))


def _exclusive_cumprod_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """w_i = alpha_i * prod_{j<i}(1 - alpha_j + 1e-10) (Renderer.py:141-142).

    The prefix product is computed by log2(S) shift-multiply doubling steps
    instead of `jnp.cumprod`: XLA lowers cumprod to a sequential S-step scan
    with per-step transposes (~13% of the mapping iteration's estimated
    cycles, BENCHLOG.md round 1); the doubling form is 6 lane-shifted
    multiplies for S=40 — same O(S log S) flops, no scan, and exact
    (products are reassociated, fp differences are ~1 ulp)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + 1e-10],
        axis=-1)
    S = shifted.shape[-1]
    p = shifted
    k = 1
    while k < S:
        pad = jnp.ones_like(p[..., :k])
        p = p * jnp.concatenate([pad, p[..., :-k]], axis=-1)
        k *= 2
    return alpha * p


def render_rays(params: Dict[str, Any], sc: SceneConfig, rc: RenderConfig,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                gt_depth: jnp.ndarray, key: jax.Array) -> RenderOutput:
    """Render a batch of rays. rays_o/rays_d: (R, 3); gt_depth: (R,) with 0
    marking no sensor depth. Differentiable w.r.t. params and rays."""
    n_total = rc.n_stratified + rc.n_importance
    k_surf, k_uni, k_pdf = jax.random.split(key, 3)
    has_depth = gt_depth > 0

    # --- depth-guided samples (valid where has_depth) ---
    z_depth = sampling.z_vals_with_depth(
        k_surf, jnp.maximum(gt_depth, 1e-6), sc.truncation, rc.n_stratified,
        rc.n_importance, rc.perturb)

    # --- depth-less samples: uniform-to-bound + importance (lazy via cond) ---
    bound = jnp.asarray(sc.bound)

    use_lod = (rc.n_fine > 0 and rc.n_fine < n_total
               and sc.encoding == "brick")
    coarse_only = rc.n_fine < 0 and sc.encoding == "brick"
    probe_levels = None
    if use_lod or coarse_only:
        from unislam_tpu.models import brick_encoding
        probe_levels, fine_levels = brick_encoding.coarse_fine_split(
            sc.brick_spec, rc.lod_split)
        # degenerate splits: no gated levels -> LOD is a no-op (full query);
        # no coarse levels -> nothing to probe/gate with (full query).
        if not fine_levels or not probe_levels:
            use_lod = coarse_only = False
            probe_levels = None

    def _no_depth_branch(_):
        far = rays_lib.ray_aabb_far(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d),
            bound)
        z_uni = sampling.z_vals_uniform(k_uni, far, rc.n_stratified,
                                        rc.perturb)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_uni[..., None]
        p_nor = scene_lib.normalize_points(sc, pts.reshape(-1, 3))
        probe_params = jax.lax.stop_gradient(params)
        sdf_uni = scene_lib.raw_sdf(probe_params, sc,
                                    jax.lax.stop_gradient(p_nor),
                                    levels=probe_levels)
        sdf_uni = sdf_uni.reshape(z_uni.shape)
        alpha_uni = sdf2alpha(sdf_uni,
                              scene_lib.beta_value(probe_params, sc))
        w_uni = _exclusive_cumprod_weights(alpha_uni)
        mids = 0.5 * (z_uni[..., 1:] + z_uni[..., :-1])
        z_samp = sampling.sample_pdf(k_pdf, mids, w_uni[..., 1:-1],
                                     rc.n_importance)
        z = jnp.sort(jnp.concatenate([z_uni, z_samp], axis=-1), axis=-1)
        # probe rendered depth: the LOD selection's surface estimate for
        # rays with no sensor depth
        d_probe = jnp.sum(w_uni * z_uni, axis=-1)
        return z, d_probe

    def _skip_branch(_):
        return (jnp.zeros((rays_o.shape[0], n_total), dtype=rays_o.dtype),
                jnp.zeros((rays_o.shape[0],), dtype=rays_o.dtype))

    z_nodepth, d_probe = jax.lax.cond(jnp.any(~has_depth), _no_depth_branch,
                                      _skip_branch, operand=None)
    z_nodepth = jax.lax.stop_gradient(z_nodepth)

    z_vals = jnp.where(has_depth[:, None], z_depth, z_nodepth)

    # --- query the field ---
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    p_nor = scene_lib.normalize_points(sc, pts.reshape(-1, 3))
    if use_lod and rc.lod_select == "field":
        raw = scene_lib.query_lod_field(
            params, sc, p_nor.reshape(z_vals.shape[0], n_total, 3),
            rc.n_fine, split=rc.lod_split, n_mid=rc.n_fine_mid,
            dedup=rc.dedup_band)
    elif use_lod:
        d_ref = jnp.where(has_depth, gt_depth,
                          jax.lax.stop_gradient(d_probe))
        score = -jnp.abs(jax.lax.stop_gradient(z_vals) - d_ref[:, None])
        _, sel_idx = jax.lax.top_k(score, rc.n_fine)     # (R, K)
        sel_onehot = (sel_idx[..., None]
                      == jnp.arange(n_total)[None, None, :])
        raw = scene_lib.query_lod(
            params, sc, p_nor.reshape(z_vals.shape[0], n_total, 3),
            sel_onehot, split=rc.lod_split, n_mid=rc.n_fine_mid,
            dedup=rc.dedup_band)
    elif coarse_only:
        raw = scene_lib.query_coarse(params, sc, p_nor,
                                     split=rc.lod_split).reshape(
            z_vals.shape[0], n_total, 4)
    else:
        raw = scene_lib.query(params, sc, p_nor).reshape(
            z_vals.shape[0], n_total, 4)
    sdf = raw[..., 3]

    # --- composite ---
    beta = scene_lib.beta_value(params, sc)
    alpha = sdf2alpha(sdf, beta)
    weights = _exclusive_cumprod_weights(alpha)

    rgb = jnp.sum(weights[..., None] * raw[..., :3], axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    termination_prob = jnp.sum(weights, axis=-1)
    pixel_unc = jnp.square(1.0 - termination_prob)
    depth_std = jnp.sqrt(
        jnp.sum(weights * jnp.square(depth[..., None] - z_vals), axis=-1))

    return RenderOutput(termination_prob, pixel_unc, depth, rgb, sdf, z_vals,
                        depth_std)


def make_render_fn(sc: SceneConfig, rc: RenderConfig):
    """A jitted fixed-batch render function (params, rays_o, rays_d,
    gt_depth, key) -> RenderOutput."""
    def fn(params, rays_o, rays_d, gt_depth, key):
        return render_rays(params, sc, rc, rays_o, rays_d, gt_depth, key)
    return jax.jit(fn)


def render_img(params: Dict[str, Any], sc: SceneConfig, rc: RenderConfig,
               intr: rays_lib.Intrinsics, c2w, key: jax.Array,
               gt_depth=None, render_fn=None):
    """Full-image render in fixed `ray_batch_size` chunks (host loop; mirrors
    Renderer.render_img, /root/reference/src/utils/Renderer.py:160-223).

    Returns (depth (H,W), rgb (H,W,3), termination (H,W), pixel_unc (H,W),
    depth_std (H,W)) as device arrays.
    """
    H, W = intr.H, intr.W
    rays_o, rays_d = rays_lib.get_rays(intr, jnp.asarray(c2w))
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    n = H * W
    if gt_depth is None:
        gtd = jnp.zeros((n,), dtype=jnp.float32)
    else:
        gtd = jnp.asarray(gt_depth).reshape(-1)

    chunk = rc.ray_batch_size
    pad = (-n) % chunk
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], axis=0)
        rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3))], axis=0)
        gtd = jnp.concatenate([gtd, jnp.ones((pad,))], axis=0)

    if render_fn is None:
        render_fn = make_render_fn(sc, rc)

    outs = []
    for i in range(0, n + pad, chunk):
        key, sub = jax.random.split(key)
        out = render_fn(params, rays_o[i:i + chunk], rays_d[i:i + chunk],
                        gtd[i:i + chunk], sub)
        outs.append(out)

    def cat(field):
        return jnp.concatenate([getattr(o, field) for o in outs], axis=0)[:n]

    return (cat("depth").reshape(H, W), cat("rgb").reshape(H, W, 3),
            cat("termination_prob").reshape(H, W),
            cat("pixel_unc").reshape(H, W), cat("depth_std").reshape(H, W))
