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

MATMUL LEVELS (mixed mode, `matmul_max_rows > 0`): dense levels small enough
(<= matmul_max_rows bricks) skip the gather entirely — the row lookup is a
one-hot (N, rows) @ (rows, 27F) matmul on the MXU, whose backward (table
gradient) is the transposed matmul, i.e. the scatter-add also runs on the
MXU. Measured (BENCHLOG.md): fwd+bwd for a 4096-row level costs ~5 ms at
168k points vs ~12 ms for gather+scatter. The resolution ladder re-spreads
so level 1 fits the matmul budget (e.g. 16, 32, 161, 816 instead of
16, 59, 219, 816). The one-hot is exact in bf16; table rows are cast to
bf16 for these matmuls (tcnn stores whole tables in fp16 — same tolerance
argument).

One table set serves BOTH decoder heads (features split downstream), halving
gather rows again vs the reference's separate SDF/color grids.
"""

from __future__ import annotations

from functools import partial
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
    matmul: np.ndarray = None  # (L,) bool — one-hot MXU lookup for the level

    @property
    def row_dim(self) -> int:
        return _BRICK_VERTS ** 3 * self.n_features

    @property
    def total_rows(self) -> int:
        return int(self.row_offsets[-1])

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def _geometric(lo: int, hi: int, n: int) -> list:
    if n == 1:
        return [int(hi)]
    scale = (hi / lo) ** (1.0 / (n - 1))
    return [int(round(lo * scale ** l)) for l in range(n)]


def make_spec(n_levels: int = 4, n_features: int = 8,
              log2_hashmap_size: int = 16, base_resolution: int = 16,
              desired_resolution: int = 816,
              matmul_max_rows: int = 0,
              matmul_hashed: int = 0,
              matmul_hashed_rows: int = 4096,
              hashed_level_rows=None) -> BrickSpec:
    """Geometric resolution ladder from base to desired (same spirit as the
    reference's per_level_scale formula, UNISLAM.py:241).

    With `matmul_max_rows > 0`, level 1 is snapped down so its dense brick
    count fits the one-hot-matmul budget and the remaining levels re-spread
    geometrically up to `desired_resolution`.

    `matmul_hashed`: additionally cap the first N *hashed* levels at
    `matmul_max_rows` table rows and serve them by one-hot MXU matmul too.
    Trades hash-collision rate (more collisions in the smaller table) for
    zero gather/scatter rows on those levels — on TPU the scatter is
    per-row-bound (~44-62 ns/row, BENCHLOG.md) while a <=4096-row one-hot
    matmul runs at the MXU FLOP floor.

    `hashed_level_rows` (sequence, optional): per-level row counts for the
    successive NON-matmul hashed levels (the k-th such level gets the k-th
    entry; the last entry repeats). XLA's gather cost is table-size-
    independent (~6 ns/row, BENCHLOG.md round 3 trace), so a gather-served
    hashed level can afford far more rows (fewer collisions) than a
    matmul-served one — collision pollution at a small mid level was
    measured to cost whole centimeters of room0-scale ATE once the level
    stopped receiving off-band cleanup gradients (BENCHLOG round 3).
    """
    if n_levels > 1:
        resolutions = _geometric(base_resolution, desired_resolution,
                                 n_levels)
    else:
        resolutions = [int(desired_resolution)]

    if matmul_max_rows > 0 and n_levels >= 3:
        mm_brick = int(round(matmul_max_rows ** (1.0 / 3.0)))
        mm_res = mm_brick * _BRICK_CELLS
        if resolutions[1] > mm_res > base_resolution:
            tail = _geometric(mm_res, desired_resolution, n_levels - 1)
            resolutions = [base_resolution] + tail

    resolutions = np.int32(resolutions)
    brick_res = np.int32(-(-resolutions // _BRICK_CELLS))  # ceil
    max_rows = 1 << log2_hashmap_size
    level_rows, hashed, matmul = [], [], []
    hashed_seen = 0
    gather_hashed_seen = 0
    for br in brick_res:
        dense = int(br) ** 3
        if dense > max_rows:
            hashed_seen += 1
            if hashed_seen <= matmul_hashed and matmul_max_rows > 0:
                level_rows.append(min(max_rows, matmul_hashed_rows))
                hashed.append(True)
                matmul.append(True)
            else:
                rows = max_rows
                if hashed_level_rows:
                    k = min(gather_hashed_seen, len(hashed_level_rows) - 1)
                    rows = min(int(hashed_level_rows[k]), dense)
                gather_hashed_seen += 1
                level_rows.append(rows)
                hashed.append(True)
                matmul.append(False)
        else:
            level_rows.append(dense)
            hashed.append(False)
            matmul.append(dense <= matmul_max_rows)
    level_rows = np.int64(level_rows)
    return BrickSpec(
        n_levels=n_levels, n_features=n_features,
        resolutions=resolutions, brick_res=brick_res,
        hashed=np.bool_(hashed), level_rows=level_rows,
        row_offsets=np.concatenate([[0], np.cumsum(level_rows)]).astype(np.int64),
        log2_hashmap_size=log2_hashmap_size,
        matmul=np.bool_(matmul))


def init_table(key: jax.Array, spec: BrickSpec,
               dtype=jnp.float32) -> jnp.ndarray:
    """(total_rows, 27*F) flat brick table, U(-1e-4, 1e-4) like tcnn."""
    return jax.random.uniform(
        key, (spec.total_rows, spec.row_dim), dtype=dtype,
        minval=-1e-4, maxval=1e-4)


def all_levels(spec: BrickSpec) -> tuple:
    return tuple(range(spec.n_levels))


def coarse_fine_split(spec: BrickSpec, mode: str = "cost") -> tuple:
    """(coarse, fine) level index tuples for the surface-LOD query path
    (scene.query_lod). "fine" levels are restricted to the surface band;
    "coarse" levels are queried at every sample.

    mode="cost" (tracking default): "fine" = only levels served by per-row
    gather/scatter (the ~9-44 ns/row-bound ones, BENCHLOG.md). Matmul-hashed
    levels stay coarse: gating them was measured to cost tracking accuracy
    badly (BENCHLOG.md round 3: with the res-128 matmul level gated, the
    off-band field every wrong-pose hypothesis reads is the res-20 grid
    alone — ATE-RMSE 11.1 cm vs 0.3 cm ungated on the room0-scale drive).

    mode="hashed" (mapping option): "fine" = ALL spatially-hashed levels,
    including matmul-hashed ones. XLA's algebraic simplifier rewrites the
    one-hot matmuls back into gathers/scatters (BENCHLOG.md round 2 trace),
    so a "cheap MXU" level is really per-row-cost-bound like any other —
    gating it to the band removes its off-band gather+scatter rows from the
    mapping iteration. Mapping optimizes against (near-)correct poses, so
    the wrong-pose-hypothesis argument above does not apply; off-band
    free-space supervision rides the dense coarse level(s).

    mode="coarse<N>" (e.g. "coarse2"): explicit split — the first N ladder
    levels are coarse, the rest fine. Decouples the phase's gating choice
    from how levels happen to be served."""
    matmul_flags = (spec.matmul if spec.matmul is not None
                    else np.zeros(spec.n_levels, bool))
    if mode == "hashed":
        gated = [bool(spec.hashed[l]) for l in range(spec.n_levels)]
    elif mode.startswith("coarse"):
        n_coarse = int(mode[len("coarse"):])
        gated = [l >= n_coarse for l in range(spec.n_levels)]
    else:
        gated = [bool(spec.hashed[l]) and not matmul_flags[l]
                 for l in range(spec.n_levels)]
    fine = tuple(l for l in range(spec.n_levels) if gated[l])
    coarse = tuple(l for l in range(spec.n_levels) if not gated[l])
    return coarse, fine


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


def _level_indices(points: jnp.ndarray, spec: BrickSpec, levels: tuple):
    """Shared index math: per-level brick row index (without table offset),
    in-brick cell `local` and fractional position `frac`. Arrays are (len
    (levels), N, ...) — a static level subset of the spec's ladder."""
    lv = list(levels)
    res = jnp.asarray(spec.resolutions[lv],
                      jnp.float32)[:, None, None]                   # (L,1,1)
    pos = points[None] * (res - 1.0)                            # (L,N,3)
    cell = jnp.floor(pos).astype(jnp.int32)
    cell = jnp.minimum(cell, (res - 2).astype(jnp.int32))
    cell = jnp.maximum(cell, 0)
    frac = pos - cell

    brick = cell // _BRICK_CELLS                                # (L,N,3)
    local = cell - brick * _BRICK_CELLS                         # in {0,1}

    br = jnp.asarray(spec.brick_res[lv].astype(np.int32))[:, None]  # (L,1)
    ub = brick.astype(jnp.uint32)
    h = (ub[..., 0] * np.uint32(_PRIMES[0])) ^ \
        (ub[..., 1] * np.uint32(_PRIMES[1])) ^ \
        (ub[..., 2] * np.uint32(_PRIMES[2]))
    rows_per_level = jnp.asarray(spec.level_rows[lv].astype(np.int32))[:, None]
    hash_idx = (h % rows_per_level.astype(jnp.uint32)).astype(jnp.int32)
    dense_idx = (brick[..., 0] + brick[..., 1] * br
                 + brick[..., 2] * br * br)
    hashed = jnp.asarray(spec.hashed[lv])[:, None]
    idx = jnp.where(hashed, hash_idx, jnp.minimum(dense_idx,
                                                  rows_per_level - 1))
    return idx, local, frac


# Forward lookup strategy threshold (measured on TPU v5e, BENCHLOG.md
# round 2). Chained-dispatch micro-probes said XLA gather (~6 ns/row,
# T-independent) beats the one-hot dot for T >= ~1000 — but in the REAL
# fwd+bwd graph the switch LOSES (~4% end-to-end): the backward's transposed
# one-hot matmul needs the one-hot anyway, and XLA CSEs the forward's
# one-hot into it, so a gather forward just moves the generation cost into
# the backward. Disabled by default; kept as an env knob for re-measurement
# on future hardware/compilers.
import os as _os
_FWD_GATHER_MIN_ROWS = int(_os.environ.get("UNISLAM_FWD_GATHER_MIN_ROWS",
                                           str(1 << 30)))


def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                 spec: BrickSpec, levels: tuple) -> jnp.ndarray:
    """Fetch each level's (N, 27F) feature rows: XLA gather for large
    levels, one-hot MXU matmul for small dense levels (see
    _FWD_GATHER_MIN_ROWS). `idx` is (len(levels), N); returns
    (len(levels), N, 27F) float32."""
    matmul_flags = (spec.matmul if spec.matmul is not None
                    else np.zeros(spec.n_levels, bool))
    offsets = spec.row_offsets.astype(np.int64)

    level_rows_out = [None] * len(levels)
    gather_pos = [k for k, l in enumerate(levels)
                  if not matmul_flags[l]
                  or spec.level_rows[l] >= _FWD_GATHER_MIN_ROWS]
    if gather_pos:
        gl = np.asarray([levels[k] for k in gather_pos])
        g_idx = idx[np.asarray(gather_pos), :] + \
            jnp.asarray(offsets[gl].astype(np.int32))[:, None]
        # bf16 rows: halves the gather + downstream interp HBM traffic;
        # tcnn stores whole tables in fp16 (same tolerance argument), and
        # the one-hot matmul path already rounded rows to bf16
        rows_g = table.astype(jnp.bfloat16)[g_idx]     # (Lg, N, 27F)
        for j, k in enumerate(gather_pos):
            level_rows_out[k] = rows_g[j]
    for k, l in enumerate(levels):
        if level_rows_out[k] is not None:
            continue
        rows_l = int(spec.level_rows[l])
        tbl = jax.lax.slice_in_dim(table, int(offsets[l]),
                                   int(offsets[l]) + rows_l, axis=0)
        onehot = (idx[k][:, None]
                  == jnp.arange(rows_l, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        level_rows_out[k] = jnp.dot(onehot, tbl.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.bfloat16)
    return jnp.stack(level_rows_out, axis=0)


def _scatter_segments(segments, spec: BrickSpec, table_shape,
                      table_dtype) -> jnp.ndarray:
    """Assemble the table cotangent from per-(level, point-set) row
    cotangents. `segments`: list of (level, idx (N,), g_rows (N, D));
    several segments may target the same level (multi-group encodes).

    - Gather-served levels: consecutive level runs are combined into ONE
      scatter-add — indices from every contributing point set are offset
      into the run's row range and concatenated, so the whole backward
      costs a single kCustom scatter (per-row-bound, ~20 ns/row on v5e).
    - Matmul levels: transposed one-hot MXU matmul per segment.

    The cotangent is assembled by CONCATENATING per-level-range pieces,
    never by dynamic-update-slicing a full-size table: the DUS form made
    XLA materialize + add several full (total_rows, 27F) tensors
    (~1.5 ms/iter at mapping scale, the fusion.12/add_any trace in
    BENCHLOG.md). The multi-group form exists for the same reason one
    level up: separate encode() calls each produce a FULL-table cotangent
    that autodiff must zero-broadcast, DUS and add (~0.7 ms/iter measured
    in the round-3 mapping trace); encode_multi funnels every group
    through this single assembly."""
    matmul_flags = (spec.matmul if spec.matmul is not None
                    else np.zeros(spec.n_levels, bool))
    offsets = spec.row_offsets.astype(np.int64)
    D = int(table_shape[1])
    by_level = {}
    for level, idx, g_rows in segments:
        by_level.setdefault(int(level), []).append((idx, g_rows))

    pieces = []         # (row_start, row_end, piece)
    run = []            # current run of gather-served present levels

    def flush_run():
        if not run:
            return
        base = int(offsets[run[0]])
        n_rows = int(offsets[run[-1] + 1] - base)
        idx_list, upd_list = [], []
        for l in run:
            off = np.int32(int(offsets[l]) - base)
            for idx, g_rows in by_level[l]:
                idx_list.append(idx + off)
                upd_list.append(g_rows)
        g_idx = (jnp.concatenate(idx_list) if len(idx_list) > 1
                 else idx_list[0])
        upd = (jnp.concatenate(upd_list, axis=0) if len(upd_list) > 1
               else upd_list[0])
        piece = jnp.zeros((n_rows, D), jnp.float32).at[g_idx].add(
            upd.astype(jnp.float32))
        pieces.append((base, base + n_rows, piece))
        run.clear()

    for l in range(spec.n_levels):
        if l not in by_level:
            continue
        if not matmul_flags[l]:
            run.append(l)
            continue
        flush_run()
        rows_l = int(spec.level_rows[l])
        acc = None
        for idx, g_rows in by_level[l]:
            onehot = (idx[:, None]
                      == jnp.arange(rows_l, dtype=jnp.int32)[None, :]
                      ).astype(jnp.bfloat16)
            g_tbl = jnp.dot(onehot.T, g_rows.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            acc = g_tbl if acc is None else acc + g_tbl
        base = int(offsets[l])
        pieces.append((base, base + rows_l, acc))
    flush_run()

    # stitch: zeros for level ranges outside the touched set
    parts, cursor = [], 0
    for start, end, piece in sorted(pieces, key=lambda p: p[0]):
        if start > cursor:
            parts.append(jnp.zeros((start - cursor, D), jnp.float32))
        parts.append(piece)
        cursor = end
    if cursor < table_shape[0]:
        parts.append(jnp.zeros((table_shape[0] - cursor, D), jnp.float32))
    g_table = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return g_table.astype(table_dtype)


def _axis_onehot_grad(local: jnp.ndarray) -> jnp.ndarray:
    """d(axis weights)/d(frac): -1 at plane `local`, +1 at `local+1`."""
    planes = jnp.arange(_BRICK_VERTS, dtype=jnp.int32)
    lo = (planes[None, None, :] == local[..., None]).astype(jnp.float32)
    hi = (planes[None, None, :] == (local + 1)[..., None]).astype(jnp.float32)
    return hi - lo


def _interp_weights(local: jnp.ndarray, frac: jnp.ndarray):
    wx = _axis_onehot(local[..., 0], frac[..., 0])              # (L,N,3)
    wy = _axis_onehot(local[..., 1], frac[..., 1])
    wz = _axis_onehot(local[..., 2], frac[..., 2])
    # Build the 27 combined trilinear weights (cheap, (L,N,27)) so the rows
    # are contracted once, not through (L,N,27,F)-sized temporaries.
    w = (wx[:, :, :, None, None] * wy[:, :, None, :, None]
         * wz[:, :, None, None, :]).reshape(local.shape[0], local.shape[1],
                                            -1)
    return w, (wx, wy, wz)


def _encode_fwd(table, points, spec, levels):
    N = points.shape[0]
    L = len(levels)
    p = jnp.clip(points, 0.0, 1.0)
    idx, local, frac = _level_indices(p, spec, levels)
    rows = _gather_rows(table, idx, spec, levels)      # (L,N,27F) bf16
    rows4 = rows.reshape(L, N, _BRICK_VERTS ** 3, spec.n_features)
    w, _ = _interp_weights(local, frac)
    # w stays f32 (exact trilinear weights); rows are bf16 storage — the
    # convert fuses into the reduce, so HBM traffic is bf16
    out = jnp.einsum("lnv,lnvf->lnf", w, rows4.astype(jnp.float32))
    out = jnp.moveaxis(out, 0, 1).reshape(N, L * spec.n_features)
    return out, (table, points, idx, local, frac, rows)


def _bwd_group(spec, levels, res, g_out):
    """Per-group backward math: row-cotangent segments for the table (fed
    to _scatter_segments) and the points cotangent."""
    table, points, idx, local, frac, rows = res
    L, F = len(levels), spec.n_features
    N = points.shape[0]
    V = _BRICK_VERTS ** 3
    g = jnp.moveaxis(g_out.reshape(N, L, F), 1, 0)     # (L,N,F)
    rows4 = rows.reshape(L, N, V, F)
    w, (wx, wy, wz) = _interp_weights(local, frac)

    # table cotangent: g_rows[l,n,v,f] = w[l,n,v] * g[l,n,f], materialized
    # in bf16 (the scatter/matmul consumers convert/accumulate in f32
    # inside their fusions — only the bf16 tensor hits HBM)
    g_bf = g.astype(jnp.bfloat16)
    g_rows = (w.astype(jnp.bfloat16)[..., None]
              * g_bf[:, :, None, :]).reshape(L, N, V * F)
    segments = [(l, idx[k], g_rows[k]) for k, l in enumerate(levels)]

    # points cotangent: through the trilinear weights only. The contraction
    # runs on the bf16 residual rows directly (f32 accumulation): casting
    # rows4 to f32 first materialized an (L,N,27,F) f32 tensor — 87 MB and
    # ~0.5 ms/iter at mapping scale (round-3 trace, reshape.2749+convert).
    g_w = jnp.einsum("lnvf,lnf->lnv", rows4, g_bf,
                     preferred_element_type=jnp.float32)  # (L,N,27)
    g_w3 = g_w.reshape(L, N, _BRICK_VERTS, _BRICK_VERTS, _BRICK_VERTS)
    dwx = _axis_onehot_grad(local[..., 0])
    dwy = _axis_onehot_grad(local[..., 1])
    dwz = _axis_onehot_grad(local[..., 2])
    gfx = jnp.einsum("lnijk,lni,lnj,lnk->ln", g_w3, dwx, wy, wz)
    gfy = jnp.einsum("lnijk,lni,lnj,lnk->ln", g_w3, wx, dwy, wz)
    gfz = jnp.einsum("lnijk,lni,lnj,lnk->ln", g_w3, wx, wy, dwz)
    g_frac = jnp.stack([gfx, gfy, gfz], axis=-1)       # (L,N,3)

    # frac = p*(res-1) - cell (cell piecewise-constant); clip gates the edge
    res_scale = jnp.asarray(spec.resolutions[list(levels)],
                            jnp.float32)[:, None, None] - 1.0
    g_p = jnp.sum(g_frac * res_scale, axis=0)          # (N,3)
    inside = (points >= 0.0) & (points <= 1.0)
    g_p = jnp.where(inside, g_p, 0.0).astype(points.dtype)
    return segments, g_p


def _encode_bwd(spec, levels, res, g_out):
    table = res[0]
    segments, g_p = _bwd_group(spec, levels, res, g_out)
    g_table = _scatter_segments(segments, spec, table.shape, table.dtype)
    return g_table, g_p


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _encode_impl(table: jnp.ndarray, points: jnp.ndarray, spec: BrickSpec,
                 levels: tuple) -> jnp.ndarray:
    out, _ = _encode_fwd(table, points, spec, levels)
    return out


def _encode_fwd_rule(table, points, spec, levels):
    return _encode_fwd(table, points, spec, levels)


_encode_impl.defvjp(_encode_fwd_rule, _encode_bwd)


def encode(table: jnp.ndarray, points: jnp.ndarray, spec: BrickSpec,
           levels: tuple = None) -> jnp.ndarray:
    """points (N, 3) in [0, 1] -> features (N, len(levels)*F). One row
    gather per point per level (or a one-hot MXU matmul for small dense
    levels); everything else is dense VPU math.

    `levels` (static tuple, default all) restricts to a ladder subset —
    the surface-LOD path queries hashed levels only near surfaces.

    Custom VJP: under plain autodiff XLA rematerializes the big gather and
    its (L,N,27,F) intermediates for the points-gradient path (measured at
    ~2x the whole mapping step, BENCHLOG.md); here the gathered rows are
    saved once and the backward reads them a single time for both
    cotangents.
    """
    if levels is None:
        levels = all_levels(spec)
    return _encode_impl(table, points, spec, tuple(levels))


def _dedup_rows(idx: jnp.ndarray, g_rows: jnp.ndarray, R: int, K: int,
                Ku: int):
    """Per-ray run-length accumulation of row cotangents targeting the SAME
    brick row, before the global scatter.

    `idx` (R*K,) must be z-ordered within each ray: a straight ray visits
    each brick at most once and in depth order, so identical target rows
    form CONSECUTIVE runs. The run members' updates are summed into one row
    by a tiny per-ray one-hot contraction (MXU work), and only R*Ku rows
    reach the scatter — which is per-ROW-bound (~20 ns/row, BENCHLOG), so
    fewer rows is the whole game. Rays whose band crosses more than Ku
    distinct bricks drop their overflow runs' TABLE gradient (the
    farthest-z end of the band); the points/pose cotangent is computed
    per-sample upstream and is never affected.
    """
    D = g_rows.shape[-1]
    idx2 = idx.reshape(R, K)
    g2 = g_rows.reshape(R, K, D)
    new = jnp.concatenate(
        [jnp.ones((R, 1), bool), idx2[:, 1:] != idx2[:, :-1]], axis=1)
    rank = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1        # (R,K)
    u = jnp.arange(Ku, dtype=jnp.int32)[None, None, :]

    # Run sums via prefix-sum + boundary differences — NOT a per-ray
    # one-hot matmul: 4200 batched (Ku x K) @ (K x 216) dots measured 31%
    # SLOWER end-to-end than no dedup at all (tiny batched matmuls are
    # ~0.2% MXU utilization). Here the D-wide work is one cumsum and one
    # take_along_axis of R*Ku boundary rows; everything else is (R, K, Ku)
    # int32 vector math.
    S = jnp.cumsum(g2.astype(jnp.float32), axis=1)              # (R,K,D)
    k_ix = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    # last sample index whose run-rank <= u (monotone in u; repeats for
    # unused u so the boundary difference is exactly zero)
    lk = jnp.max(jnp.where(rank[:, :, None] <= u, k_ix + 1, 0),
                 axis=1) - 1                                    # (R,Ku)
    # boundary rows as a FLAT row gather (R*Ku whole (D,) rows at ~6
    # ns/row) — take_along_axis with a broadcast (R,Ku,1) index lowers to
    # a per-ELEMENT gather of R*Ku*D scalars (measured +3 ms/iter)
    flat = (jnp.arange(R, dtype=jnp.int32)[:, None] * K
            + lk.clip(0)).reshape(-1)
    P = S.reshape(R * K, D)[flat].reshape(R, Ku, D)
    g_acc = jnp.diff(P, axis=1, prepend=jnp.zeros_like(P[:, :1]))
    # first sample index of run u -> its target row (unused u keep a
    # stale index; their g_acc row is exactly zero, so the scatter adds 0)
    fk = jnp.min(jnp.where((rank[:, :, None] == u) & new[:, :, None],
                           k_ix, K), axis=1).clip(0, K - 1)     # (R,Ku)
    idx_u = jnp.take_along_axis(idx2, fk, axis=1)
    return idx_u.reshape(-1), g_acc.reshape(R * Ku, D).astype(g_rows.dtype)


def _encode_multi_fwd(table, points_tuple, spec, levels_groups, dedup):
    outs, residuals = [], []
    for points, levels in zip(points_tuple, levels_groups):
        out, res = _encode_fwd(table, points, spec, levels)
        outs.append(out)
        residuals.append(res)
    return tuple(outs), (table, tuple(residuals))


def _encode_multi_bwd(spec, levels_groups, dedup, res, g_outs):
    table, residuals = res
    segments, g_points = [], []
    for res_g, levels, g_out, dd in zip(residuals, levels_groups, g_outs,
                                        dedup):
        seg, g_p = _bwd_group(spec, levels, res_g, g_out)
        if dd is not None:
            R, K, Ku = dd
            seg = [(l, *_dedup_rows(idx, g_rows, R, K, Ku))
                   for l, idx, g_rows in seg]
        segments.extend(seg)
        g_points.append(g_p)
    g_table = _scatter_segments(segments, spec, table.shape, table.dtype)
    return g_table, tuple(g_points)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _encode_multi_impl(table, points_tuple, spec, levels_groups, dedup):
    outs, _ = _encode_multi_fwd(table, points_tuple, spec, levels_groups,
                                dedup)
    return outs


_encode_multi_impl.defvjp(_encode_multi_fwd, _encode_multi_bwd)


def encode_multi(table: jnp.ndarray, points_tuple, spec: BrickSpec,
                 levels_groups, dedup=None) -> tuple:
    """Encode SEVERAL point sets against per-set ladder subsets with one
    fused backward. points_tuple: sequence of (N_k, 3) arrays;
    levels_groups: matching sequence of static level tuples. Returns a
    tuple of (N_k, len(levels_k)*F) feature arrays.

    Why not k independent encode() calls: each call's VJP must return a
    cotangent of the FULL table shape, so autodiff zero-broadcasts,
    dynamic-update-slices and ADDS k full (total_rows, 27F) tensors —
    ~0.7 ms/iter of pure assembly traffic at mapping scale (round-3
    trace: dynamic-update-slice.26/.27 + broadcast.12063 + layout
    copies). Here all groups' row cotangents funnel into ONE
    _scatter_segments assembly: a single combined scatter-add for the
    gather-served levels and a single concatenated cotangent. The
    surface-LOD mapping step uses this for its three point sets (all
    samples x coarse levels, near-band x mid level, band x finest level).

    `dedup` (optional): per-group None or a static (R, K, Ku) triple. A
    non-None entry declares the group's points to be R rays x K z-ordered
    band samples, and run-length-accumulates the backward's row cotangents
    to at most Ku rows per ray before the scatter (see _dedup_rows). Band
    samples are ~5x denser than the finest bricks, so most adjacent
    samples re-scatter the same row — the scatter is the mapping step's
    biggest line item (1.42 ms/iter of 5.53, round-4 trace)."""
    if dedup is None:
        dedup = (None,) * len(points_tuple)
    return _encode_multi_impl(table, tuple(points_tuple), spec,
                              tuple(tuple(l) for l in levels_groups),
                              tuple(dedup))
