"""Follow-up profiling: isolate the MLP-head backward cost, transpose
relayouts, one-hot matmul encode for small levels, bf16 gather/scatter.

Usage: python examples/profile_map2.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.asarray(leaves[0]).reshape(-1)[0])


def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps, out


def main():
    from unislam_tpu.models import brick_encoding, decoders

    print("device:", jax.devices()[0])
    N = 168_000
    L, F = 4, 8
    spec = brick_encoding.make_spec(n_levels=L, n_features=F,
                                    log2_hashmap_size=16,
                                    desired_resolution=816)
    key = jax.random.PRNGKey(0)
    table = brick_encoding.init_table(key, spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    mlp1 = decoders.init_mlp(jax.random.PRNGKey(2), L * F, 16, 1, 2)
    mlp2 = decoders.init_mlp(jax.random.PRNGKey(3), L * F, 16, 3, 2)

    # A. single head bwd->both
    def loss_one(tb, p, w):
        feat = brick_encoding.encode(tb, p, spec)
        return jnp.sum(decoders.mlp_apply(w, feat, "tanh"))
    g1 = jax.jit(jax.grad(loss_one, argnums=(0, 1, 2)))
    t, _ = timeit(g1, table, pts, mlp1)
    print(f"encode+1head bwd->all   {t * 1e3:8.2f} ms")

    # B. two heads bwd->both
    def loss_two(tb, p, w1, w2):
        feat = brick_encoding.encode(tb, p, spec)
        return jnp.sum(decoders.mlp_apply(w1, feat, "tanh")) + \
            jnp.sum(decoders.mlp_apply(w2, feat, "sigmoid"))
    g2 = jax.jit(jax.grad(loss_two, argnums=(0, 1, 2, 3)))
    t, _ = timeit(g2, table, pts, mlp1, mlp2)
    print(f"encode+2head bwd->all   {t * 1e3:8.2f} ms")

    # C. two heads, table-grad only (no point grads)
    g2t = jax.jit(jax.grad(loss_two, argnums=(0, 2, 3)))
    t, _ = timeit(g2t, table, pts, mlp1, mlp2)
    print(f"encode+2head bwd->tb    {t * 1e3:8.2f} ms")

    # D. MLP heads alone at 168k (feat precomputed)
    feat0 = jax.jit(lambda tb, p: brick_encoding.encode(tb, p, spec))(
        table, pts)

    def loss_mlps(f_, w1, w2):
        return jnp.sum(decoders.mlp_apply(w1, f_, "tanh")) + \
            jnp.sum(decoders.mlp_apply(w2, f_, "sigmoid"))
    gm = jax.jit(jax.grad(loss_mlps, argnums=(0, 1, 2)))
    t, _ = timeit(gm, feat0, mlp1, mlp2)
    print(f"2 heads alone bwd->all  {t * 1e3:8.2f} ms")

    # E. moveaxis cost: encode variant returning (L,N,F) summed into (N,F)
    def loss_nomove(tb, p):
        # replicate encode() but skip moveaxis/reshape: sum levels
        out = brick_encoding.encode(tb, p, spec)
        return jnp.sum(out)
    # (baseline already measured as encode bwd->both 38ms)

    # F. one-hot matmul "gather" for small levels, fwd+bwd
    for rows in (512, 4096):
        tbl = jax.random.normal(jax.random.PRNGKey(7),
                                (rows, spec.row_dim), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(8), (N,), 0, rows)

        def loss_oh(tb_, ix):
            oh = (ix[:, None] == jnp.arange(rows)[None, :]
                  ).astype(jnp.bfloat16)
            out = jnp.dot(oh, tb_.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return jnp.sum(out)
        goh = jax.jit(jax.grad(loss_oh))
        t, _ = timeit(goh, tbl, idx)
        print(f"one-hot {rows:5d} fwd+bwd  {t * 1e3:8.2f} ms")

        @jax.jit
        def gat(tb_, ix):
            return jnp.sum(tb_[ix])
        t, _ = timeit(gat, tbl, idx)
        print(f"gather  {rows:5d} fwd 168k {t * 1e3:8.2f} ms")

    # G. raw gather/scatter at bf16 rows
    rows_idx = jax.random.randint(jax.random.PRNGKey(5), (4 * N,), 0,
                                  spec.total_rows)
    grows16 = jax.random.normal(jax.random.PRNGKey(6),
                                (4 * N, spec.row_dim)).astype(jnp.bfloat16)
    table16 = table.astype(jnp.bfloat16)

    @jax.jit
    def scat16(tb, gi, gr_):
        return tb.at[gi].add(gr_)
    t, _ = timeit(scat16, table16, rows_idx, grows16)
    print(f"raw scatter bf16 672k   {t * 1e3:8.2f} ms")

    @jax.jit
    def gath16(tb, gi):
        return tb[gi]
    t, _ = timeit(gath16, table16, rows_idx)
    print(f"raw gather bf16 672k    {t * 1e3:8.2f} ms")

    # H. gather at half rows (336k) f32 — the mixed-mode target shape
    ridx2 = rows_idx[: 2 * N]

    @jax.jit
    def gathh(tb, gi):
        return tb[gi]
    t, _ = timeit(gathh, table, ridx2)
    print(f"raw gather f32 336k     {t * 1e3:8.2f} ms")
    t, _ = timeit(gath16, table16, ridx2)
    print(f"raw gather bf16 336k    {t * 1e3:8.2f} ms")

    # I. adam: plain vs multi_transform over the scene tree
    import optax
    from unislam_tpu.models import scene as scene_lib
    params = {"table": table, "sdf_mlp": mlp1, "color_mlp": mlp2,
              "beta": jnp.ones((1,))}
    plain = optax.adam(1e-3)
    st = plain.init(params)

    @jax.jit
    def step_plain(pr, s):
        g = jax.tree_util.tree_map(lambda x: x * 0.001, pr)
        up, s2 = plain.update(g, s, pr)
        return optax.apply_updates(pr, up), s2
    t, _ = timeit(step_plain, params, st)
    print(f"adam plain              {t * 1e3:8.2f} ms")

    mt = optax.multi_transform(
        {"hash": optax.adam(0.05), "dec": optax.adam(1e-3)},
        {"table": "hash", "sdf_mlp": "dec", "color_mlp": "dec",
         "beta": "dec"})
    st2 = mt.init(params)

    @jax.jit
    def step_mt(pr, s):
        g = jax.tree_util.tree_map(lambda x: x * 0.001, pr)
        up, s2 = mt.update(g, s, pr)
        return optax.apply_updates(pr, up), s2
    t, _ = timeit(step_mt, params, st2)
    print(f"adam multi_transform    {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
