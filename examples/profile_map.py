"""Decompose the mapping-iteration cost on the real TPU.

Times each stage of the hot path (bench.py workload shape) so optimization
targets are measured, not guessed. All timings force scalar fetches (the
axon relay makes block_until_ready a no-op).

Usage: python examples/profile_map.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    # force completion of warmup
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps, out


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    # fetch one scalar element from a leaf to force completion
    x = leaves[0]
    float(jnp.asarray(x).reshape(-1)[0])


def main():
    from unislam_tpu.models import brick_encoding, decoders
    from unislam_tpu.models import scene as scene_lib

    dev = jax.devices()[0]
    print("device:", dev)

    N = 168_000  # 4200 rays x 40 samples
    spec = brick_encoding.make_spec(n_levels=4, n_features=8,
                                    log2_hashmap_size=16,
                                    desired_resolution=816)
    print(f"spec rows={spec.total_rows} row_dim={spec.row_dim} "
          f"table MB={spec.total_rows * spec.row_dim * 4 / 1e6:.1f}")
    key = jax.random.PRNGKey(0)
    table = brick_encoding.init_table(key, spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    # 1. encode forward
    enc = jax.jit(lambda t, p: brick_encoding.encode(t, p, spec))
    t, _ = timeit(enc, table, pts)
    print(f"encode fwd            {t * 1e3:8.2f} ms")

    # 2. encode fwd + bwd to table
    def loss_t(t_, p_):
        return jnp.sum(brick_encoding.encode(t_, p_, spec))
    g_t = jax.jit(jax.grad(loss_t))
    t, _ = timeit(g_t, table, pts)
    print(f"encode bwd->table     {t * 1e3:8.2f} ms")

    # 3. encode fwd + bwd to points
    g_p = jax.jit(jax.grad(loss_t, argnums=1))
    t, _ = timeit(g_p, table, pts)
    print(f"encode bwd->points    {t * 1e3:8.2f} ms")

    # 4. encode fwd + bwd to both
    g_b = jax.jit(jax.grad(loss_t, argnums=(0, 1)))
    t, _ = timeit(g_b, table, pts)
    print(f"encode bwd->both      {t * 1e3:8.2f} ms")

    # 5. bf16 table variants
    table16 = table.astype(jnp.bfloat16)
    t, _ = timeit(enc, table16, pts)
    print(f"encode fwd bf16       {t * 1e3:8.2f} ms")
    t, _ = timeit(g_b, table16, pts)
    print(f"encode bwd-both bf16  {t * 1e3:8.2f} ms")

    # 6. full scene query (encode + 2 MLP heads)
    sc_cfg = {
        "scale": 1, "mapping": {"bound": [[-4, 4], [-4, 4], [-4, 4]]},
        "planes_res": {"bound_dividable": 0.24},
        "grid": {"voxel_sdf": 0.01, "voxel_color": 0.01,
                 "hash_size_sdf": 16, "hash_size_color": 19,
                 "encoding": "brick", "brick_levels": 4,
                 "brick_features": 8, "brick_hash_size": 16},
        "model": {"truncation": 0.06, "c_dim": 32},
        "rendering": {"learnable_beta": True},
    }
    sc = scene_lib.make_scene_config(sc_cfg)
    params = scene_lib.init_params(jax.random.PRNGKey(2), sc)
    q = jax.jit(lambda pr, p_: scene_lib.query(pr, sc, p_))
    t, _ = timeit(q, params, pts)
    print(f"query fwd             {t * 1e3:8.2f} ms")

    def loss_q(pr, p_):
        return jnp.sum(scene_lib.query(pr, sc, p_))
    gq = jax.jit(jax.grad(loss_q, argnums=(0, 1)))
    t, _ = timeit(gq, params, pts)
    print(f"query bwd->both       {t * 1e3:8.2f} ms")

    # 7. renderer fwd + grad
    from unislam_tpu.render import renderer
    rc = renderer.RenderConfig(n_stratified=32, n_importance=8)
    R = 4200
    rays_o = jnp.zeros((R, 3)) + jnp.array([0.0, 0.0, 0.0])
    rays_d = jax.random.normal(jax.random.PRNGKey(3), (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    gt_depth = jax.random.uniform(jax.random.PRNGKey(4), (R,), minval=0.5,
                                  maxval=3.0)
    rf = jax.jit(lambda pr, k: renderer.render_rays(pr, sc, rc, rays_o,
                                                    rays_d, gt_depth, k))
    t, _ = timeit(rf, params, key)
    print(f"render fwd            {t * 1e3:8.2f} ms")

    def loss_r(pr, k):
        out = renderer.render_rays(pr, sc, rc, rays_o, rays_d, gt_depth, k)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    gr = jax.jit(jax.grad(loss_r))
    t, _ = timeit(gr, params, key)
    print(f"render bwd->params    {t * 1e3:8.2f} ms")

    # 8. adam update over scene params alone
    import optax
    opt = optax.adam(1e-3)
    st = opt.init(params)

    @jax.jit
    def adam_step(pr, st_):
        g = jax.tree_util.tree_map(lambda x: x * 0.001, pr)
        up, st2 = opt.update(g, st_, pr)
        return optax.apply_updates(pr, up), st2
    t, _ = timeit(adam_step, params, st)
    print(f"adam update (params)  {t * 1e3:8.2f} ms")

    # 9. scatter-add grad rows only (the bwd-to-table core)
    rows_idx = jax.random.randint(jax.random.PRNGKey(5), (4 * N,), 0,
                                  spec.total_rows)
    grows = jax.random.normal(jax.random.PRNGKey(6), (4 * N, spec.row_dim))

    @jax.jit
    def scat(tb, gi, gr_):
        return tb.at[gi].add(gr_)
    t, _ = timeit(scat, table, rows_idx, grows)
    print(f"raw scatter 672k rows {t * 1e3:8.2f} ms")

    @jax.jit
    def gath(tb, gi):
        return tb[gi]
    t, _ = timeit(gath, table, rows_idx)
    print(f"raw gather 672k rows  {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
