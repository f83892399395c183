"""Ray generation and pixel sampling (pure JAX, static shapes).

Conventions follow the reference exactly (OpenGL camera: +x right, +y up,
-z forward; see /root/reference/src/common.py:95-107,210-228): a pixel (i, j)
(i = column, j = row) maps to camera-frame direction
``[(i-cx)/fx, -(j-cy)/fy, -1]``.

Design delta from the reference: pixel selection happens *inside* jit with
explicit PRNG keys and fixed sample counts, so tracking/mapping steps never
recompile; the reference's `torch.randint` host sampling
(/root/reference/src/common.py:109-150) becomes `jax.random.randint`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float


def camera_ray_dirs(intr: Intrinsics, dtype=jnp.float32) -> jnp.ndarray:
    """Dense camera-frame ray directions (H, W, 3), OpenGL convention.

    Mirrors /root/reference/src/common.py:35-46 (`get_camera_rays`).
    """
    j, i = jnp.meshgrid(
        jnp.arange(intr.H, dtype=dtype), jnp.arange(intr.W, dtype=dtype),
        indexing="ij")
    return jnp.stack(
        [(i - intr.cx) / intr.fx, -(j - intr.cy) / intr.fy,
         -jnp.ones_like(i)], axis=-1)


def dirs_to_world(dirs: jnp.ndarray, c2w: jnp.ndarray):
    """Rotate camera-frame dirs (..., 3) into world frame and broadcast origins.

    c2w: (..., 4, 4) or (4, 4). Returns (rays_o, rays_d) with dirs' shape.
    """
    rays_d = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], dirs)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(intr: Intrinsics, c2w: jnp.ndarray):
    """Full-image world-frame rays: (H, W, 3) origins and directions.

    Mirrors /root/reference/src/common.py:210-228.
    """
    dirs = camera_ray_dirs(intr)
    c2w = c2w.astype(dirs.dtype)
    rays_d = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], dirs)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_from_uv(i: jnp.ndarray, j: jnp.ndarray, c2w: jnp.ndarray,
                 intr: Intrinsics):
    """World rays for pixel coords i (cols), j (rows) under poses c2w.

    i, j: (N,) float; c2w: (4, 4) or batched to match. Mirrors
    /root/reference/src/common.py:95-107.
    """
    dirs = jnp.stack(
        [(i - intr.cx) / intr.fx, -(j - intr.cy) / intr.fy,
         -jnp.ones_like(i)], axis=-1)
    rays_d = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], dirs)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_pixels(key: jax.Array, n: int, h0: int, h1: int, w0: int, w1: int,
                  depth: jnp.ndarray, color: jnp.ndarray):
    """Sample n pixels uniformly from image region [h0, h1) x [w0, w1).

    depth: (H, W); color: (H, W, 3). Returns (i, j, depth_n, color_n) with
    i = cols (N,), j = rows (N,). TPU-native version of
    /root/reference/src/common.py:109-150 (`select_uv` + `get_sample_uv`):
    instead of flattening the crop and `randint`-ing into it, sample row/col
    indices directly — same distribution, no host-side meshgrid.
    """
    kj, ki = jax.random.split(key)
    j = jax.random.randint(kj, (n,), h0, h1)
    i = jax.random.randint(ki, (n,), w0, w1)
    depth_n = depth[j, i]
    color_n = color[j, i]
    return i.astype(jnp.float32), j.astype(jnp.float32), depth_n, color_n


def ray_aabb_far(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                 bound: jnp.ndarray) -> jnp.ndarray:
    """Distance along each ray to its exit from the axis-aligned scene bound.

    bound: (3, 2) [min, max] per axis. Matches the reference's pre-filter
    computation `min over axes of max over (near, far) slab hits`
    (/root/reference/src/Tracker.py:177-184, Renderer.py:108-113).
    """
    t = (bound[None, :, :] - rays_o[..., None]) / rays_d[..., None]
    return jnp.min(jnp.max(t, axis=-1), axis=-1)
