"""TPU-native multiresolution BRICK encoding: one gather row per point/level.

Why this exists (measured on TPU v5e, see BENCHLOG.md): XLA's gather/scatter
costs ~10-45 ns *per row* regardless of row width, so tcnn-style hash grids
(8 corner rows x 16 levels = 128 rows/point, reference
src/UNISLAM.py:224-259) are ~100x off speed-of-light on TPU. This encoding
restructures the memory layout so a point's whole trilinear neighborhood at
a level is ONE contiguous row:

- Each level is a lattice of BRICKS of 2x2x2 cells. A brick stores the
  features of its 3x3x3 = 27 vertices (a one-vertex halo), so ANY trilinear
  footprint inside the brick needs only that brick's row: exactly one
  (27*F)-float gather per point per level.
- Coarse levels store bricks densely; fine levels spatially hash the brick
  coordinate (same xor-prime hash as instant-ngp). Halo vertices are
  duplicated between neighboring bricks (their parameters are independent;
  dense SDF/color supervision keeps both sides consistent — the same
  argument that makes hash collisions benign in instant-ngp).
- The 8-of-27 corner selection + trilinear interpolation is a tiny one-hot
  contraction per axis — pure VPU work, no further gathers.
- Backward to the table is a scatter of N single rows (large slices), the
  fastest scatter form XLA offers on TPU.

One table set serves BOTH decoder heads (features split downstream), halving
gather rows again vs the reference's separate SDF/color grids.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)
_BRICK_CELLS = 2          # cells per brick axis
_BRICK_VERTS = _BRICK_CELLS + 1   # 3 -> 27 vertices per brick


class BrickSpec(NamedTuple):
    n_levels: int
    n_features: int           # features per level
    # Derived static arrays:
    resolutions: np.ndarray   # (L,) cell-lattice resolution per level
    brick_res: np.ndarray     # (L,) brick-lattice resolution per level
    hashed: np.ndarray        # (L,) bool
    level_rows: np.ndarray    # (L,) rows in the table per level
    row_offsets: np.ndarray   # (L+1,)
    log2_hashmap_size: int

    @property
    def row_dim(self) -> int:
        return _BRICK_VERTS ** 3 * self.n_features

    @property
    def total_rows(self) -> int:
        return int(self.row_offsets[-1])

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def make_spec(n_levels: int = 4, n_features: int = 8,
              log2_hashmap_size: int = 16, base_resolution: int = 16,
              desired_resolution: int = 816) -> BrickSpec:
    """Geometric resolution ladder from base to desired (same spirit as the
    reference's per_level_scale formula, UNISLAM.py:241)."""
    if n_levels > 1:
        scale = (desired_resolution / base_resolution) ** (1.0 / (n_levels - 1))
    else:
        scale = 1.0
    resolutions = np.int32(
        [round(base_resolution * scale ** l) for l in range(n_levels)])
    brick_res = np.int32(-(-resolutions // _BRICK_CELLS))  # ceil
    max_rows = 1 << log2_hashmap_size
    level_rows, hashed = [], []
    for br in brick_res:
        dense = int(br) ** 3
        if dense > max_rows:
            level_rows.append(max_rows)
            hashed.append(True)
        else:
            level_rows.append(dense)
            hashed.append(False)
    level_rows = np.int64(level_rows)
    return BrickSpec(
        n_levels=n_levels, n_features=n_features,
        resolutions=resolutions, brick_res=brick_res,
        hashed=np.bool_(hashed), level_rows=level_rows,
        row_offsets=np.concatenate([[0], np.cumsum(level_rows)]).astype(np.int64),
        log2_hashmap_size=log2_hashmap_size)


def init_table(key: jax.Array, spec: BrickSpec,
               dtype=jnp.float32) -> jnp.ndarray:
    """(total_rows, 27*F) flat brick table, U(-1e-4, 1e-4) like tcnn."""
    return jax.random.uniform(
        key, (spec.total_rows, spec.row_dim), dtype=dtype,
        minval=-1e-4, maxval=1e-4)


def _axis_onehot(local: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    """Per-axis interpolation weights over the 3 brick vertex planes.

    local: (L, N) int in {0, 1} — which cell of the brick along this axis.
    frac: (L, N) in [0, 1). Returns (L, N, 3) weights: (1-frac) at plane
    `local`, frac at `local+1`, 0 elsewhere.
    """
    planes = jnp.arange(_BRICK_VERTS, dtype=jnp.int32)          # (3,)
    lo = (planes[None, None, :] == local[..., None])
    hi = (planes[None, None, :] == (local + 1)[..., None])
    return (lo * (1.0 - frac[..., None]) + hi * frac[..., None])


def encode(table: jnp.ndarray, points: jnp.ndarray,
           spec: BrickSpec) -> jnp.ndarray:
    """points (N, 3) in [0, 1] -> features (N, L*F). One row gather per
    point per level; everything else is dense VPU math."""
    N = points.shape[0]
    p = jnp.clip(points, 0.0, 1.0)

    res = jnp.asarray(spec.resolutions, jnp.float32)[:, None, None]  # (L,1,1)
    pos = p[None] * (res - 1.0)                                 # (L,N,3)
    cell = jnp.floor(pos).astype(jnp.int32)
    cell = jnp.minimum(cell, (res - 2).astype(jnp.int32))
    cell = jnp.maximum(cell, 0)
    frac = pos - cell

    brick = cell // _BRICK_CELLS                                # (L,N,3)
    local = cell - brick * _BRICK_CELLS                         # in {0,1}

    # brick row index: dense or hashed
    br = jnp.asarray(spec.brick_res.astype(np.int32))[:, None]  # (L,1)
    ub = brick.astype(jnp.uint32)
    h = (ub[..., 0] * np.uint32(_PRIMES[0])) ^ \
        (ub[..., 1] * np.uint32(_PRIMES[1])) ^ \
        (ub[..., 2] * np.uint32(_PRIMES[2]))
    rows_per_level = jnp.asarray(spec.level_rows.astype(np.int32))[:, None]
    hash_idx = (h % rows_per_level.astype(jnp.uint32)).astype(jnp.int32)
    dense_idx = (brick[..., 0] + brick[..., 1] * br
                 + brick[..., 2] * br * br)
    hashed = jnp.asarray(spec.hashed)[:, None]
    idx = jnp.where(hashed, hash_idx, jnp.minimum(dense_idx,
                                                  rows_per_level - 1))
    idx = idx + jnp.asarray(spec.row_offsets.astype(np.int32))[:-1, None]

    rows = table[idx]                                           # (L,N,27F)
    rows = rows.astype(jnp.float32).reshape(
        spec.n_levels, N, _BRICK_VERTS ** 3, spec.n_features)

    wx = _axis_onehot(local[..., 0], frac[..., 0])              # (L,N,3)
    wy = _axis_onehot(local[..., 1], frac[..., 1])
    wz = _axis_onehot(local[..., 2], frac[..., 2])
    # Build the 27 combined trilinear weights FIRST (cheap, (L,N,27)), then
    # contract the vertex axis once — the gathered rows are read a single
    # time instead of through (L,N,27,F)-sized multi-operand temporaries.
    w = (wx[:, :, :, None, None] * wy[:, :, None, :, None]
         * wz[:, :, None, None, :]).reshape(spec.n_levels, N, -1)
    out = jnp.einsum("lnv,lnvf->lnf", w, rows)
    return jnp.moveaxis(out, 0, 1).reshape(N, spec.out_dim)
