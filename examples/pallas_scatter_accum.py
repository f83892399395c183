"""Pallas scatter-accumulate — BUILT, MEASURED, REJECTED (round 4).

Verdict: does NOT beat XLA's in-graph scatter end-to-end, but is ~100x
MORE ACCURATE. Measurements (v5e, mapping-scale shapes: 67,200 update
rows x 216 feats into an 81,920-row table):

| path | ms | max err vs f64 |
|---|---|---|
| XLA `.at[idx].add` in-graph (fused zero-init) | 1.42 | 2.2e-2 |
| XLA `.at[idx].add` isolated                   | 2.44 | 2.2e-2 |
| this kernel (best: block 512 / chunk 512)     | 2.11 | 2.4e-7 |
|   of which argsort                            | 0.90 | |
|   of which row permute + bf16 cast            | 1.09 | |
|   of which pallas block-MXU reduction         | 1.77 | |

Why it loses: every row-granular op on TPU (sort-permute gather, scatter)
floors at ~16-20 ns/row regardless of bandwidth, and the sort-based design
pays TWO of them (permute + the kernel's per-block DMAs) before the MXU
reduction even starts. XLA's in-graph scatter already sorts internally
(sort.40 in the round-4 trace) and fuses the zero-init, so the extra pass
can't be amortized at these row counts.

Why it's kept: (a) the accuracy result is load-bearing — XLA's TPU
scatter-add visibly accumulates at reduced precision (2.2e-2 error on
bf16 update rows vs this kernel's 2.4e-7), which matters if table-grad
precision ever becomes a quality issue; (b) at larger N (more rays/chip,
multi-frame batched mapping) the MXU reduction amortizes and the
crossover flips. Re-evaluate then.

Original design notes:

Pallas scatter-accumulate: the grid-table gradient reduction.

The brick encoding's backward must compute `g[idx[i]] += upd[i]` for ~67k
update rows per mapping iteration (models/brick_encoding.py
_scatter_segments). XLA lowers `.at[idx].add(upd)` to a kCustom scatter
that processes update rows serially at ~20 ns/row on v5e — 1.4 ms/iter,
the single largest op in the mapping step (round-4 trace), at 1/19th of
HBM bandwidth. tcnn's CUDA backward does the same reduction with atomics;
the TPU-native answer is sort + blocked MXU reduction:

1. sort updates by destination row (cheap: 67k int keys + one row gather),
2. grid over table blocks of `block_rows`; each grid step owns one
   (block_rows, D) f32 VMEM accumulator (the output block),
3. the sorted updates covering that block (a contiguous chunk range found
   by searchsorted, delivered via scalar prefetch) stream through VMEM in
   fixed-size chunks; each chunk folds into the accumulator with a
   one-hot (block_rows, chunk) @ (chunk, D) MXU dot in bf16 with f32
   accumulation — exactly the add-reduction, but vectorized.

FLOPs ≈ (N + chunk·n_blocks) · block_rows · 2D ≈ 39 GFLOP at mapping
scale — ~0.2 ms of bf16 MXU time instead of 1.4 ms of serial row RMW.
Numerics: f32 accumulation of bf16 updates, same as the XLA path (which
converts the bf16 update rows to f32 before its scatter); only the
reduction ORDER differs (within-block matmul order vs scatter order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref,            # scalar-prefetch: (n_blocks+1,) s32
            idx_ref,               # (n_chunks, chunk) s32, sorted, VMEM
            upd_ref,               # (N_pad, D) bf16, sorted, HBM (manual DMA)
            out_ref,               # (block_rows, D) f32 block, VMEM
            buf_ref,               # scratch (2, chunk, D) bf16
            sem_ref,               # scratch DMA sems (2,)
            *, block_rows: int, chunk: int):
    b = pl.program_id(0)
    s = starts_ref[b]
    e = starts_ref[b + 1]
    c0 = s // chunk
    c1 = pl.cdiv(e, chunk)

    out_ref[:] = jnp.zeros_like(out_ref)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            upd_ref.at[pl.ds(c * chunk, chunk), :],
            buf_ref.at[slot],
            sem_ref.at[slot])

    @pl.when(c0 < c1)
    def _():
        get_dma(c0 % 2, c0).start()

        def body(c, _):
            slot = c % 2

            @pl.when(c + 1 < c1)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()

            # positions of this chunk's rows in the sorted update stream;
            # only [s, e) belongs to this block (chunks at the range edges
            # are shared with neighbouring blocks and masked here)
            pos = (c * chunk
                   + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1))
            in_range = (pos >= s) & (pos < e)                  # (1, chunk)
            ids = idx_ref[c, :]                                # (chunk,)
            local = ids.reshape(1, chunk) - b * block_rows
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, chunk), 0)
            onehot = ((rows == local) & in_range).astype(jnp.bfloat16)
            out_ref[:] += jnp.dot(onehot, buf_ref[slot],
                                  preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(c0, c1, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scatter_accumulate(idx: jnp.ndarray, upd: jnp.ndarray, n_rows: int,
                       block_rows: int = 1024,
                       chunk: int = 512) -> jnp.ndarray:
    """Returns (n_rows, D) f32 with `out[idx[i]] += upd[i]` (idx unsorted,
    values in [0, n_rows)). Exact f32 accumulation of bf16/f32 updates."""
    N, D = upd.shape
    # Mosaic requires HBM DMA slices 128-aligned in the last dim; pad the
    # feature width (e.g. 27F=216 -> 256, ~18% extra bytes, still far
    # cheaper than the serial scatter) and slice it back off at the end
    D_pad = -(-D // 128) * 128
    n_blocks = -(-n_rows // block_rows)
    n_pad = -(-N // chunk) * chunk

    # sort by destination row; pad with n_rows (lands past every block's
    # [s, e) range so the position mask drops it)
    order = jnp.argsort(idx)
    idx_s = idx[order]
    upd_s = upd[order].astype(jnp.bfloat16)
    # (n_chunks, chunk) layout: a chunk is one row — the (N, 1) column
    # layout would lane-pad to 128 and blow VMEM (34 MB for 67k indices)
    idx_p = jnp.full((n_pad,), np.int32(n_rows), jnp.int32)
    idx_p = jax.lax.dynamic_update_slice(idx_p, idx_s.astype(jnp.int32),
                                         (0,))
    idx_p = idx_p.reshape(n_pad // chunk, chunk)
    upd_p = jnp.zeros((n_pad, D_pad), jnp.bfloat16)
    upd_p = jax.lax.dynamic_update_slice(upd_p, upd_s, (0, 0))

    starts = jnp.searchsorted(
        idx_s, jnp.arange(n_blocks + 1, dtype=jnp.int32) * block_rows
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # idx_p (whole)
            pl.BlockSpec(memory_space=pltpu.ANY),       # upd_p (HBM, DMA)
        ],
        out_specs=pl.BlockSpec((block_rows, D_pad), lambda b, starts: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, D_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_rows=block_rows, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rows, D_pad),
                                       jnp.float32),
        grid_spec=grid_spec,
    )(starts, idx_p, upd_p)
    if n_blocks * block_rows != n_rows:
        out = jax.lax.slice_in_dim(out, 0, n_rows, axis=0)
    if D_pad != D:
        out = jax.lax.slice_in_dim(out, 0, D, axis=1)
    return out
