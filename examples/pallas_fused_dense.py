"""EXPERIMENT (measured and REJECTED, round 2 - kept for the record):
Pallas-fused brick-table lookup + trilinear interp for matmul levels.

Hypothesis: the XLA matmul-level path materializes (N, T) one-hot matrices
in HBM (XLA cannot fuse a generator into a dot operand), so an in-VMEM
Pallas kernel that generates the one-hot per tile should win.

Outcome on TPU v5e (BENCHLOG.md round 2, chained-dispatch measurements):
- Per-grid-step overhead (~2-5 us/step) at the VMEM-forced small tiles
  makes the kernel LOSE to plain XLA at every table size
  (1.26/1.50/2.72 ms vs XLA's 0.53/1.27/2.51 ms at T=512/1536/4096,
  168k lookups of 216-wide rows).
- Per-point index math on (TILE, 1) columns inside a kernel runs at 1/128
  lane utilization (2.2 ms at mapping scale) - hoisting it to XLA (this
  file's design passes idx/local/frac in) did not close the gap.
- `tpu.dynamic_gather` cannot shuffle across >1 vreg of sublanes, so a
  true VMEM gather is unavailable in Pallas.
- The decisive discovery: round 1's "44 ns/row" XLA gather estimate was
  inflated by per-dispatch relay overhead; the real chained cost is
  ~6 ns/row, T-independent - so plain XLA gather beats BOTH the one-hot
  matmul (T >= ~1000) and this kernel in the forward. That finding (not
  this kernel) is what models/brick_encoding.py's mixed fwd strategy now
  implements.

Kept runnable as an example/regression probe; not part of the package.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_V = 3                                  # brick vertices per axis
_V3 = _V ** 3                           # 27


class LevelMeta(NamedTuple):
    """Static per-level constants. `offset` is the row offset inside the
    table SLICE passed to the kernel (not the global table)."""
    rows: int
    offset: int


def _col_vertex_ids(F: int):
    """(1, 27F) per-column vertex plane ids (i, j, k) of the row layout
    rows[..., ((i*3 + j)*3 + k)*F + f]."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, _V3 * F), 1)
    vi = col // (_V * _V * F)
    vj = (col // (_V * F)) % _V
    vk = (col // F) % _V
    return vi, vj, vk


def _axis_w(v, local, frac):
    """Trilinear weight of vertex-plane `v` given cell `local` and `frac`
    (brick_encoding._axis_onehot, one axis)."""
    return jnp.where(v == local, 1.0 - frac,
                     jnp.where(v == local + 1, frac, 0.0))


def _axis_dw(v, local):
    """d(axis weight)/d(frac): -1 at plane local, +1 at local+1."""
    return (v == local + 1).astype(jnp.float32) - \
        (v == local).astype(jnp.float32)


def _vsum_selector(F: int, dtype):
    """(27F, F) selector S[c, f] = 1 iff c % F == f; (w*rows) @ S sums the
    27 vertex contributions per feature."""
    r = jax.lax.broadcasted_iota(jnp.int32, (_V3 * F, F), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_V3 * F, F), 1)
    return ((r % F) == c).astype(dtype)


def _fwd_kernel(metas, F, idx_ref, local_ref, frac_ref, table_ref,
                feat_ref, rows_ref):
    D = _V3 * F
    vi, vj, vk = _col_vertex_ids(F)
    S = _vsum_selector(F, jnp.float32)
    feats = []
    for k, m in enumerate(metas):
        idx = idx_ref[:, k:k + 1]
        lx = local_ref[:, 3 * k + 0:3 * k + 1]
        ly = local_ref[:, 3 * k + 1:3 * k + 2]
        lz = local_ref[:, 3 * k + 2:3 * k + 3]
        fx = frac_ref[:, 3 * k + 0:3 * k + 1]
        fy = frac_ref[:, 3 * k + 1:3 * k + 2]
        fz = frac_ref[:, 3 * k + 2:3 * k + 3]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, m.rows), 1)
        onehot = (idx == iota_t).astype(jnp.bfloat16)          # (TILE, T)
        tbl = table_ref[m.offset:m.offset + m.rows, :]
        rows = jnp.dot(onehot, tbl,
                       preferred_element_type=jnp.float32)     # (TILE, 27F)
        rows_ref[:, k * D:(k + 1) * D] = rows.astype(jnp.bfloat16)
        w = _axis_w(vi, lx, fx) * _axis_w(vj, ly, fy) * _axis_w(vk, lz, fz)
        feats.append(jnp.dot(w * rows, S,
                             preferred_element_type=jnp.float32))
    feat_ref[:] = feats[0] if len(feats) == 1 else \
        jnp.concatenate(feats, axis=1)


def _bwd_kernel(metas, F, idx_ref, local_ref, frac_ref, rows_ref, g_ref,
                gtab_ref, gfrac_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        gtab_ref[:] = jnp.zeros_like(gtab_ref)

    D = _V3 * F
    vi, vj, vk = _col_vertex_ids(F)
    St = _vsum_selector(F, jnp.float32).T                      # (F, 27F)
    gfs = []
    for k, m in enumerate(metas):
        idx = idx_ref[:, k:k + 1]
        lx = local_ref[:, 3 * k + 0:3 * k + 1]
        ly = local_ref[:, 3 * k + 1:3 * k + 2]
        lz = local_ref[:, 3 * k + 2:3 * k + 3]
        fx = frac_ref[:, 3 * k + 0:3 * k + 1]
        fy = frac_ref[:, 3 * k + 1:3 * k + 2]
        fz = frac_ref[:, 3 * k + 2:3 * k + 3]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, m.rows), 1)
        onehot = (idx == iota_t).astype(jnp.bfloat16)
        wx = _axis_w(vi, lx, fx)
        wy = _axis_w(vj, ly, fy)
        wz = _axis_w(vk, lz, fz)
        g_l = g_ref[:, k * F:(k + 1) * F]                      # (TILE, F)
        g216 = jnp.dot(g_l, St, preferred_element_type=jnp.float32)
        # table cotangent: onehot^T @ (w * g216), accumulated across tiles
        g_rows = (wx * wy * wz) * g216
        gt = jax.lax.dot_general(
            onehot, g_rows.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (T, 27F)
        gtab_ref[m.offset:m.offset + m.rows, :] += gt
        # frac cotangent through the trilinear weights
        g_w = rows_ref[:, k * D:(k + 1) * D].astype(jnp.float32) * g216
        gfx = jnp.sum(g_w * _axis_dw(vi, lx) * wy * wz, axis=1,
                      keepdims=True)
        gfy = jnp.sum(g_w * wx * _axis_dw(vj, ly) * wz, axis=1,
                      keepdims=True)
        gfz = jnp.sum(g_w * wx * wy * _axis_dw(vk, lz), axis=1,
                      keepdims=True)
        gfs += [gfx, gfy, gfz]
    gfrac_ref[:] = jnp.concatenate(gfs, axis=1)


def _pad_rows(a: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    if n_pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)], axis=0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_for(metas) -> int:
    """Keep the biggest one-hot tile (TILE x T bf16) around 2 MB of VMEM."""
    t_max = max(m.rows for m in metas)
    return 512 if t_max <= 2048 else 256


def encode_fwd(table_bf16: jnp.ndarray, idx: jnp.ndarray,
               local: jnp.ndarray, frac: jnp.ndarray,
               metas: Sequence[LevelMeta], F: int, tile_n: int = 0):
    """idx (N, L) int32, local/frac (N, 3L), table slice (T, 27F) bf16 ->
    (features (N, L*F) f32, rows residual (N, L*27F) bf16)."""
    metas = tuple(metas)
    L = len(metas)
    D = _V3 * F
    tile_n = tile_n or _tile_for(metas)
    N = idx.shape[0]
    pad = (-N) % tile_n
    idx_p = _pad_rows(idx, pad)
    local_p = _pad_rows(local, pad)
    frac_p = _pad_rows(frac, pad)
    grid = (idx_p.shape[0] // tile_n,)
    T = table_bf16.shape[0]
    feat, rows = pl.pallas_call(
        partial(_fwd_kernel, metas, F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, L * F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, L * D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((idx_p.shape[0], L * F), jnp.float32),
            jax.ShapeDtypeStruct((idx_p.shape[0], L * D), jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(idx_p, local_p, frac_p, table_bf16)
    return feat[:N], rows[:N]


def encode_bwd(idx: jnp.ndarray, local: jnp.ndarray, frac: jnp.ndarray,
               rows: jnp.ndarray, g_feat: jnp.ndarray,
               metas: Sequence[LevelMeta], F: int, table_rows: int,
               tile_n: int = 0):
    """Backward of encode_fwd. Returns (g_table (table_rows, 27F) f32,
    g_frac (N, 3L) f32 — d(loss)/d(frac) per level; the caller applies the
    (res-1) chain to get point gradients, like the XLA path)."""
    metas = tuple(metas)
    L = len(metas)
    D = _V3 * F
    tile_n = tile_n or _tile_for(metas)
    N = idx.shape[0]
    pad = (-N) % tile_n
    idx_p = _pad_rows(idx, pad)
    local_p = _pad_rows(local, pad)
    frac_p = _pad_rows(frac, pad)
    rows_p = _pad_rows(rows, pad)
    g_p = _pad_rows(g_feat, pad)
    grid = (idx_p.shape[0] // tile_n,)
    g_table, g_frac = pl.pallas_call(
        partial(_bwd_kernel, metas, F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, L * D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, L * F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((table_rows, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((table_rows, D), jnp.float32),
            jax.ShapeDtypeStruct((idx_p.shape[0], 3 * L), jnp.float32),
        ],
        interpret=_interpret(),
    )(idx_p, local_p, frac_p, rows_p, g_p)
    return g_table, g_frac[:N]
