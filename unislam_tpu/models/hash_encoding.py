"""Multiresolution hash-grid encoding (instant-ngp family) in pure JAX.

TPU-native replacement for tiny-cuda-nn's CUDA `HashGrid` encoding that the
reference builds in /root/reference/src/UNISLAM.py:224-259 and samples in
src/networks/decoders.py:91-105. Same algorithm family (Mueller et al. 2022,
"Instant Neural Graphics Primitives", arXiv:2201.05989):

- L levels of 3D grids with geometrically increasing resolution
  (`per_level_scale = exp2(log2(desired_res / n_levels) / (n_levels - 1))`,
  reference UNISLAM.py:241), base resolution 16, F features per level.
- Coarse levels whose dense grid fits the table budget are stored densely;
  finer levels spatially hash their corners into a 2**log2_hashmap_size
  table with the xor-of-primes hash.
- Trilinear interpolation of the 8 corner features, output is the
  level-major concatenation (N, L*F).

Parameters live in ONE flat `(total_entries, F)` jnp array so optax treats
the whole grid as a single leaf; gradients reach it through XLA gather /
scatter-add. This is the reference-parity mode; the TPU-throughput path is
models/brick_encoding.py (see BENCHLOG.md for why per-corner gathers lose
on TPU).

All per-level constants (scales, resolutions, offsets, hashed flags) are
static numpy, so the encode traces to fixed-shape gathers that XLA can batch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# xor-hash primes (public instant-ngp constants).
_PRIMES = (1, 2654435761, 805459861)


class HashGridSpec(NamedTuple):
    """Static description of a multiresolution hash grid."""
    n_levels: int
    n_features: int
    log2_hashmap_size: int
    base_resolution: int
    per_level_scale: float
    # Derived (numpy, static):
    scales: np.ndarray        # (L,) float32: grid scale per level
    resolutions: np.ndarray   # (L,) int32: cells per axis per level
    offsets: np.ndarray       # (L+1,) int64: entry offset per level
    hashed: np.ndarray        # (L,) bool: True -> spatial hash, False -> dense
    level_sizes: np.ndarray   # (L,) int64: entries per level

    @property
    def total_entries(self) -> int:
        return int(self.offsets[-1])

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def make_spec(n_levels: int = 16, n_features: int = 2,
              log2_hashmap_size: int = 19, base_resolution: int = 16,
              desired_resolution: int = 512,
              per_level_scale: float | None = None) -> HashGridSpec:
    """Build the static spec. `per_level_scale` defaults to the reference's
    formula (/root/reference/src/UNISLAM.py:241)."""
    if per_level_scale is None:
        per_level_scale = float(
            np.exp2(np.log2(desired_resolution / n_levels) / (n_levels - 1)))
    hashmap_size = 1 << log2_hashmap_size

    scales = np.float32(
        [base_resolution * per_level_scale ** l - 1.0 for l in range(n_levels)])
    resolutions = np.int32(np.ceil(scales) + 1)

    level_sizes = []
    hashed = []
    for res in resolutions:
        dense = int(res) ** 3
        if dense > hashmap_size:
            level_sizes.append(hashmap_size)
            hashed.append(True)
        else:
            # align to 8 like tcnn for identical table sizes
            level_sizes.append(-(-dense // 8) * 8)
            hashed.append(False)
    level_sizes = np.int64(level_sizes)
    offsets = np.concatenate([[0], np.cumsum(level_sizes)]).astype(np.int64)
    return HashGridSpec(n_levels, n_features, log2_hashmap_size,
                        base_resolution, per_level_scale, scales, resolutions,
                        offsets, np.bool_(hashed), level_sizes)


def init_table(key: jax.Array, spec: HashGridSpec,
               dtype=jnp.float32) -> jnp.ndarray:
    """tcnn-style U(-1e-4, 1e-4) init of the flat (total_entries, F) table."""
    return jax.random.uniform(
        key, (spec.total_entries, spec.n_features), dtype=dtype,
        minval=-1e-4, maxval=1e-4)


# (8, 3) corner offsets in {0,1}^3 (meshgrid 'ij': x varies slowest)
_CORNERS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                    axis=-1).reshape(8, 3).astype(np.int32)


def _corner_indices(spec: HashGridSpec, pos_grid: jnp.ndarray) -> jnp.ndarray:
    """Flat table indices for the 8 corners of each point at each level.

    pos_grid: (L, N, 3) int32 floor coordinates. Returns (L, N, 8) int32
    indices *including* per-level offsets into the flat table.

    Built per AXIS, combining the two (L, N) candidates per axis into the
    8 corners by static stacking — the earlier (L, N, 8, 3) coordinate
    temp put the size-3 axis in a padded minor dim and blew up 16x on TPU
    (10.7 GB at the mesher's 500k-point batches; round-4 OOM).
    """
    res = jnp.asarray(spec.resolutions)[:, None]                   # (L,1)
    res3 = jnp.asarray(spec.resolutions)[:, None]
    # per-axis clipped corner coordinates: axis a, offset b -> (L, N)
    c = [[jnp.clip(pos_grid[:, :, a] + b, 0, res - 1) for b in (0, 1)]
         for a in range(3)]
    mask = np.uint32((1 << spec.log2_hashmap_size) - 1)

    def corner_idx(bx, by, bz):
        x, y, z = c[0][bx], c[1][by], c[2][bz]
        # hashed: xor of prime-multiplied coords, modulo table size
        h = ((x.astype(jnp.uint32) * np.uint32(_PRIMES[0]))
             ^ (y.astype(jnp.uint32) * np.uint32(_PRIMES[1]))
             ^ (z.astype(jnp.uint32) * np.uint32(_PRIMES[2])))
        hash_idx = (h & mask).astype(jnp.int32)
        dense_idx = x + y * res3 + z * res3 * res3
        return jnp.where(jnp.asarray(spec.hashed)[:, None],
                         hash_idx, dense_idx)                      # (L,N)

    idx = jnp.stack([corner_idx(*_CORNERS[k]) for k in range(8)],
                    axis=-1)                                       # (L,N,8)
    # Guard dense levels whose aligned size < res^3 can't happen (size is
    # rounded up), but clamp against per-level size for safety.
    sizes = jnp.asarray(spec.level_sizes.astype(np.int32))[:, None, None]
    idx = jnp.minimum(idx, sizes - 1)
    return idx + jnp.asarray(spec.offsets.astype(np.int32))[:-1, None, None]


def _interp_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Trilinear corner weights. frac: (L, N, 3) -> (L, N, 8), assembled
    per axis (see _corner_indices for why no (L, N, 8, 3) temp)."""
    w = [[1.0 - frac[:, :, a], frac[:, :, a]] for a in range(3)]
    return jnp.stack([w[0][bx] * w[1][by] * w[2][bz]
                      for bx, by, bz in _CORNERS], axis=-1)


def _encode_fwd(table: jnp.ndarray, points: jnp.ndarray,
                spec: HashGridSpec):
    p = jnp.clip(points, 0.0, 1.0)
    scales = jnp.asarray(spec.scales)[:, None, None]               # (L,1,1)
    pos = p[None, :, :] * scales + 0.5                             # (L,N,3)
    pos_floor = jnp.floor(pos)
    frac = pos - pos_floor
    idx = _corner_indices(spec, pos_floor.astype(jnp.int32))       # (L,N,8)
    w = _interp_weights(frac)                                      # (L,N,8)
    feats = table[idx]                                             # (L,N,8,F)
    out = jnp.sum(w[..., None] * feats, axis=2)                    # (L,N,F)
    # level-major concat -> (N, L*F), matching tcnn's output layout
    out = jnp.moveaxis(out, 0, 1).reshape(points.shape[0], spec.out_dim)
    return out, (table, points, idx, frac, feats)


def _encode_bwd(spec: HashGridSpec, res, g_out):
    """Backward for both cotangents from the saved residuals.

    - table: ONE scatter-add of the L*N*8 corner-row cotangents
      (w * g, f32 — identical numerics to autodiff's gather-VJP).
    - points: through the trilinear weights only. The per-axis weights
      factorize (w_c = wx[cx] * wy[cy] * wz[cz] with wa = [1-fa, fa]), so
      d out / d frac_a needs only (L, N)-shaped products — no (L, N, 8, 3)
      temporary (the shape whose 16x TPU lane padding OOM'd round 4).
    """
    table, points, idx, frac, feats = res
    N = points.shape[0]
    L, F = spec.n_levels, spec.n_features
    g = jnp.moveaxis(g_out.reshape(N, L, F), 1, 0)                 # (L,N,F)
    w = _interp_weights(frac)                                      # (L,N,8)

    g_rows = (w[..., None] * g[:, :, None, :]).reshape(-1, F)
    g_table = jnp.zeros(table.shape, jnp.float32).at[
        idx.reshape(-1)].add(g_rows.astype(jnp.float32))

    g_w = jnp.einsum("lncf,lnf->lnc", feats, g)                    # (L,N,8)
    wl = [[1.0 - frac[:, :, a], frac[:, :, a]] for a in range(3)]
    g_frac = []
    for a in range(3):
        acc = None
        for c, corner in enumerate(_CORNERS):
            other = g_w[:, :, c]
            for a2 in range(3):
                if a2 != a:
                    other = other * wl[a2][corner[a2]]
            term = other if corner[a] == 1 else -other
            acc = term if acc is None else acc + term
        g_frac.append(acc)
    g_frac = jnp.stack(g_frac, axis=-1)                            # (L,N,3)

    scales = jnp.asarray(spec.scales)[:, None, None]
    g_p = jnp.sum(g_frac * scales, axis=0)                         # (N,3)
    inside = (points >= 0.0) & (points <= 1.0)
    g_p = jnp.where(inside, g_p, 0.0).astype(points.dtype)
    return g_table.astype(table.dtype), g_p


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _encode_impl(table: jnp.ndarray, points: jnp.ndarray,
                 spec: HashGridSpec) -> jnp.ndarray:
    out, _ = _encode_fwd(table, points, spec)
    return out


_encode_impl.defvjp(_encode_fwd, _encode_bwd)


def encode(table: jnp.ndarray, points: jnp.ndarray,
           spec: HashGridSpec) -> jnp.ndarray:
    """Encode points (N, 3) in [0, 1] -> features (N, L*F).

    Input is clamped to [0, 1] like the reference's
    `sample_hash_grid_feature` (/root/reference/src/networks/decoders.py:101).

    Custom VJP (mirrors brick_encoding's saved-residual design): the
    gathered corner rows are pinned as residuals so the backward never
    re-gathers the 8*L rows per point (under plain autodiff XLA's scheduler
    may rematerialize the gather for the points-gradient path — the hash
    mapping graph measured ~40 ms/iter in round 4), and both cotangents are
    assembled without (L, N, 8, F)-blowup temporaries. Numerics are
    bit-compatible f32 (same corner-row scatter-add the gather VJP emits).
    """
    return _encode_impl(table, points, spec)
