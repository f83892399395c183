"""Decompose the brick-encode cost at mapping scale (168k points):
gather-levels fwd, matmul-levels fwd, interpolation, full encode fwd,
encode v&g, and the table-scatter alone. Drives the Pallas kernel design.

Usage: python examples/profile_encode.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unislam_tpu.models import brick_encoding as be


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.asarray(leaves[0]).reshape(-1)[0])


def timeit(fn, *args, reps=8, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps, out


def main():
    print("device:", jax.devices()[0])
    N = 168_000
    spec = be.make_spec(n_levels=4, n_features=8, log2_hashmap_size=16,
                        base_resolution=16, desired_resolution=816,
                        matmul_max_rows=4096)
    print("resolutions:", spec.resolutions, "rows:", spec.level_rows,
          "hashed:", spec.hashed, "matmul:", spec.matmul)
    key = jax.random.PRNGKey(0)
    table = be.init_table(key, spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    # full encode fwd
    enc = jax.jit(lambda t, p: be.encode(t, p, spec))
    t, _ = timeit(enc, table, pts)
    print(f"encode fwd                 {t*1e3:8.2f} ms")

    # encode v&g (both cotangents)
    def loss(t_, p_):
        return jnp.sum(be.encode(t_, p_, spec) ** 2)
    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    t, _ = timeit(vg, table, pts)
    print(f"encode v&g (table+points)  {t*1e3:8.2f} ms")

    vg_t = jax.jit(jax.value_and_grad(loss, argnums=0))
    t, _ = timeit(vg_t, table, pts)
    print(f"encode v&g (table only)    {t*1e3:8.2f} ms")

    # pieces
    LV = be.all_levels(spec)

    @jax.jit
    def indices(p_):
        return be._level_indices(jnp.clip(p_, 0, 1), spec, LV)
    t, (idx, local, frac) = timeit(indices, pts)
    print(f"  level indices            {t*1e3:8.2f} ms")

    @jax.jit
    def gather(t_, idx_):
        return be._gather_rows(t_, idx_, spec, LV)
    t, rows = timeit(gather, table, idx)
    print(f"  gather+matmul rows       {t*1e3:8.2f} ms")

    @jax.jit
    def interp(rows_, local_, frac_):
        rows4 = rows_.reshape(spec.n_levels, N, 27, spec.n_features)
        w, _ = be._interp_weights(local_, frac_)
        return jnp.einsum("lnv,lnvf->lnf", w, rows4)
    t, _ = timeit(interp, rows, local, frac)
    print(f"  interp einsum            {t*1e3:8.2f} ms")

    # scatter alone at this scale (the backward's table path)
    g_rows = jnp.ones((spec.n_levels, N, spec.row_dim), jnp.float32)

    @jax.jit
    def scatter(g_rows_, idx_):
        return be._scatter_rows_grad(g_rows_, idx_, spec, LV, table.shape,
                                     table.dtype)
    t, _ = timeit(scatter, g_rows, idx)
    print(f"  scatter_rows_grad        {t*1e3:8.2f} ms")

    # scatter split: gather levels only (XLA scatter-add)
    gl = np.asarray([l for l in range(spec.n_levels) if not spec.matmul[l]])
    offs = spec.row_offsets.astype(np.int64)

    @jax.jit
    def scatter_gl(g_rows_, idx_):
        g_idx = idx_[gl, :] + jnp.asarray(offs[gl].astype(np.int32))[:, None]
        z = jnp.zeros(table.shape, jnp.float32)
        return z.at[g_idx.reshape(-1)].add(
            g_rows_[gl].reshape(-1, g_rows_.shape[-1]))
    t, _ = timeit(scatter_gl, g_rows, idx)
    print(f"    xla scatter (hashed lvls) {t*1e3:6.2f} ms "
          f"({gl.size * N} rows)")

    # sort cost at this scale
    @jax.jit
    def sort_rows(g_rows_, idx_):
        flat_idx = idx_[gl, :].reshape(-1)
        order = jnp.argsort(flat_idx)
        return flat_idx[order], g_rows_[gl].reshape(-1, spec.row_dim)[order]
    t, _ = timeit(sort_rows, g_rows, idx)
    print(f"    argsort+permute rows      {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
