"""Consolidated mapping-path profiling harness (TPU).

One parameterized entry for the round-1..4 measurement scripts whose
numbers BENCHLOG.md cites (formerly profile_map.py + profile_map{2..6}.py,
folded per VERDICT r4 #8; variant numbers keep the historical file
numbering so the BENCHLOG cross-references stay resolvable):

  --variant 1 (stages)    decompose encode/query/render/adam/scatter stages
  --variant 2 (micro)     MLP-head backward, transpose relayouts, one-hot
                          matmul encode, bf16 gather/scatter micro-probes
  --variant 3 (real)      the REAL mapping/tracking steps stage by stage
  --variant 4 (surgical)  disable-one-stage deltas inside the mapping loss
  --variant 5 (assembly)  bisect the batch-assembly overhead under grad
  --variant 6 (posefix)   one-hot pose-selection fix validation + RNG cost

All timings force scalar fetches (the axon relay makes block_until_ready a
no-op). Usage: python examples/profile_map.py --variant N
"""

import argparse
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
    x = leaves[0]
    float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, reps=8, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps, out


# Decompose the mapping-iteration cost on the real TPU.
#
# Times each stage of the hot path (bench.py workload shape) so optimization
# targets are measured, not guessed. All timings force scalar fetches (the
# axon relay makes block_until_ready a no-op).
def variant_1():
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


# Follow-up profiling: isolate the MLP-head backward cost, transpose
# relayouts, one-hot matmul encode for small levels, bf16 gather/scatter.
def variant_2():
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


# Profile the REAL mapping/tracking steps stage by stage on TPU.
#
# Builds the exact bench.py workload and times: loss forward, value_and_grad,
# +optimizer update, full fused phase per-iter; same for tracking. The gap
# between stages localizes unaccounted time.
def variant_3():
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine import selection as selection_lib
    from unislam_tpu.engine.slam import UniSLAM

    print("device:", jax.devices()[0])
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    cfg = make_config(ds, {
        "tracking": {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                     "ignore_edge_H": 75},
        "mapping": {"pixels": 4000, "iters": 15, "iters_first": 15,
                    "every_frame": 4, "keyframe_every": 4},
        "rendering": {"n_stratified": 32, "n_importance": 8},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 "encoding": "brick", "brick_levels": 4,
                 "brick_features": 8, "brick_hash_size": 16},
    })
    slam = UniSLAM(cfg, ds, seed=0)
    slam.step_frame(0)
    slam.step_frame(1)

    color, depth, _ = slam._frame(2)
    count = int(slam.bank.count)
    probs, extra = selection_lib.window_probs(
        slam.max_kf, count, np.zeros(slam.max_kf, bool))
    pg = np.zeros((slam.max_kf + 1, 1), np.float32)
    pg[[0, slam.max_kf], 0] = 1.0  # exercise BA pose grads
    # COPY the scene params into the tree: map_phase donates its opt_tree
    # (mapper.py donate_argnums), and stage (e) still needs slam.params live
    opt_tree = {"scene": jax.tree_util.tree_map(jnp.copy, slam.params),
                "poses": jnp.concatenate(
                    [slam.bank.pose7,
                     pose_lib.matrix_to_cam_pose(
                         jnp.asarray(slam.est_c2w[1])[None])], axis=0)}
    probs_j = jnp.asarray(probs, jnp.float32)
    extra_j = jnp.asarray(extra, jnp.float32)
    pg_j = jnp.asarray(pg)
    key = jax.random.PRNGKey(42)

    # rebuild the internal pieces of the mapping step for staged timing
    from unislam_tpu.engine import mapper as mapper_lib
    step, opt, phase = mapper_lib.make_mapping_step(
        slam.sc, slam.rc, slam.mc, slam.intr, slam.max_kf, slam.bank_size)

    # (a) single step (1 dispatch per iter)
    mstate = opt.init(opt_tree)
    t, _ = timeit(step, opt_tree, mstate, slam.bank, depth, color,
                  slam.cam_rays_d, probs_j, extra_j, pg_j, key, jnp.float32(1.0))
    print(f"map single step          {t * 1e3:8.2f} ms")

    # phase donates opt_tree/opt_state -> rebind outputs between calls
    # (the profile_trace_map.py pattern); each stage gets fresh copies
    def time_phase(n_iters, pgrad, reps):
        ot = jax.tree_util.tree_map(jnp.copy, opt_tree)
        ms = opt.init(ot)
        for _ in range(2):
            ot, ms, ml = phase(ot, ms, slam.bank, depth, color,
                               slam.cam_rays_d, probs_j, extra_j, pgrad,
                               key, jnp.int32(n_iters), jnp.float32(1.0))
        _fetch(ml)
        t0 = time.time()
        for _ in range(reps):
            ot, ms, ml = phase(ot, ms, slam.bank, depth, color,
                               slam.cam_rays_d, probs_j, extra_j, pgrad,
                               key, jnp.int32(n_iters), jnp.float32(1.0))
        _fetch(ml)
        return (time.time() - t0) / reps

    # (b) fused phase, n=1
    t = time_phase(1, pg_j, reps=8)
    print(f"map phase n=1            {t * 1e3:8.2f} ms")

    # (c) fused phase, n=15 (per-iter)
    t = time_phase(15, pg_j, reps=4)
    print(f"map phase n=15 per-iter  {t / 15 * 1e3:8.2f} ms")

    # (d) no-BA variant: pose grads off
    t = time_phase(15, jnp.zeros_like(pg_j), reps=4)
    print(f"map phase no-BA per-iter {t / 15 * 1e3:8.2f} ms")

    # (e) tracking per-iter
    pose7 = pose_lib.matrix_to_cam_pose(jnp.asarray(slam.est_c2w[1])[None])[0]
    pose = {"R": pose7[:4], "T": pose7[4:]}
    tstate = slam.track_opt.init(pose)
    t, _ = timeit(slam.track_frame_fn, slam.params, pose, tstate, depth,
                  color, key, jnp.int32(8), reps=6)
    print(f"track frame n=8 per-iter {t / 8 * 1e3:8.2f} ms")

    t, _ = timeit(slam.track_step, slam.params, pose, tstate, depth, color,
                  key)
    print(f"track single step        {t * 1e3:8.2f} ms")


# Surgical breakdown of the real mapping loss's value_and_grad on TPU.
#
# Variants disable one stage each; the deltas localize the ~39 ms that the
# component profiles (profile_map/2/3) could not account for.
def variant_4():
    from unislam_tpu.core import losses as losses_lib
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core import rays as rays_lib
    from unislam_tpu.core import sampling
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine import mapper as mapper_lib
    from unislam_tpu.engine import selection as selection_lib
    from unislam_tpu.engine.slam import UniSLAM
    from unislam_tpu.models import scene as scene_lib
    from unislam_tpu.render import renderer

    print("device:", jax.devices()[0])
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    cfg = make_config(ds, {
        "tracking": {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                     "ignore_edge_H": 75},
        "mapping": {"pixels": 4000, "iters": 15, "iters_first": 15,
                    "every_frame": 4, "keyframe_every": 4},
        "rendering": {"n_stratified": 32, "n_importance": 8},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 "encoding": "brick", "brick_levels": 4,
                 "brick_features": 8, "brick_hash_size": 16},
    })
    slam = UniSLAM(cfg, ds, seed=0)
    slam.step_frame(0)
    slam.step_frame(1)

    sc, rc, mc = slam.sc, slam.rc, slam.mc
    color, depth, _ = slam._frame(2)
    count = int(slam.bank.count)
    probs, extra = selection_lib.window_probs(
        slam.max_kf, count, np.zeros(slam.max_kf, bool))
    pg = np.zeros((slam.max_kf + 1, 1), np.float32)
    pg[[0, slam.max_kf], 0] = 1.0
    opt_tree = {"scene": slam.params,
                "poses": jnp.concatenate(
                    [slam.bank.pose7,
                     pose_lib.matrix_to_cam_pose(
                         jnp.asarray(slam.est_c2w[1])[None])], axis=0)}
    probs_j = jnp.asarray(probs, jnp.float32)
    extra_j = jnp.asarray(extra, jnp.float32)
    pg_j = jnp.asarray(pg)
    key = jax.random.PRNGKey(42)
    args = (opt_tree, slam.bank, depth, color, slam.cam_rays_d, probs_j,
            extra_j, pg_j, key)

    # A. full loss_fn value_and_grad
    loss_fn = mapper_lib.make_loss_fn(sc, rc, mc, intr, slam.max_kf,
                                      slam.bank_size)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    t, _ = timeit(vg, *args)
    print(f"A full loss v&g            {t * 1e3:8.2f} ms")

    # A2. loss only (no grad)
    lf = jax.jit(loss_fn)
    t, _ = timeit(lf, *args)
    print(f"A2 full loss fwd only      {t * 1e3:8.2f} ms")

    # shared batch assembly (outside the variants)
    bound = jnp.asarray(sc.bound)
    n_rays = mc.pixels + mc.extra_rays
    HW = intr.H * intr.W

    def assemble(opt_tree, bank, cur_depth, cur_color, cur_rays_d, sel_probs,
                 extra_probs, pose_grad_mask, key):
        poses = opt_tree["poses"]
        poses = poses * pose_grad_mask + \
            jax.lax.stop_gradient(poses) * (1.0 - pose_grad_mask)
        k_slot, k_extra, k_pix_b, k_pix_c, k_render = jax.random.split(key, 5)
        slot_main = jax.random.categorical(
            k_slot, jnp.log(sel_probs + 1e-20), shape=(mc.pixels,))
        slot_extra = jax.random.categorical(
            k_extra, jnp.log(extra_probs + 1e-20), shape=(mc.extra_rays,))
        slot = jnp.concatenate([slot_main, slot_extra])
        pix_b = jax.random.randint(k_pix_b, (n_rays,), 0, slam.bank_size)
        pix_c = jax.random.randint(k_pix_c, (n_rays,), 0, HW)
        is_cur = slot == slam.max_kf
        kf_slot = jnp.minimum(slot, slam.max_kf - 1)
        gt_depth = jnp.where(is_cur, cur_depth.reshape(-1)[pix_c],
                             bank.depth[kf_slot, pix_b])
        gt_color = jnp.where(is_cur[:, None], cur_color.reshape(-1, 3)[pix_c],
                             bank.color[kf_slot, pix_b])
        dir_cam = jnp.where(is_cur[:, None], cur_rays_d.reshape(-1, 3)[pix_c],
                            bank.rays_d[kf_slot, pix_b])
        c2w = pose_lib.cam_pose_to_matrix(poses)
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dir_cam)
        rays_o = c2w[slot, :3, 3]
        return rays_o, rays_d, gt_depth, gt_color, k_render

    # B. assembly + render + sum outputs (no losses/masks)
    def loss_B(opt_tree, *rest):
        rays_o, rays_d, gt_depth, gt_color, k_render = assemble(opt_tree,
                                                                *rest)
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o, rays_d,
                                   gt_depth, k_render)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_B)), *args)
    print(f"B no-losses v&g            {t * 1e3:8.2f} ms")

    # C. fixed rays + render + real losses (no assembly under grad)
    rays_o0, rays_d0, gtd0, gtc0, krender0 = jax.jit(assemble)(*args)

    # C2. rays as TRACED jit arguments (no constant folding) + sum loss —
    # isolates assembly cost from the render fwd+bwd proper.
    def loss_C2(opt_tree, rays_o, rays_d, gtd, k):
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o, rays_d,
                                   gtd, k)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_C2)), opt_tree, rays_o0,
                  rays_d0, gtd0, krender0)
    print(f"C2 traced-rays no-loss v&g {t * 1e3:8.2f} ms")

    # C3. same but differentiate wrt rays too (the BA/tracking wiring)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_C2, argnums=(0, 1, 2))),
                  opt_tree, rays_o0, rays_d0, gtd0, krender0)
    print(f"C3 +ray grads v&g          {t * 1e3:8.2f} ms")
    w_sdf = losses_lib.SdfLossWeights(mc.w_sdf_fs, mc.w_sdf_center,
                                      mc.w_sdf_tail)

    def loss_C(opt_tree):
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o0,
                                   rays_d0, gtd0, krender0)
        pixel_unc = jax.lax.stop_gradient(out.pixel_unc)
        alpha_mask = (1.0 - pixel_unc) > 0.99
        far = rays_lib.ray_aabb_far(rays_o0, rays_d0, bound)
        inside = far >= gtd0
        depth_mask = (gtd0 > 0) & alpha_mask & inside
        m_sdf = depth_mask.astype(jnp.float32)
        loss = losses_lib.sdf_losses(out.sdf, out.z_vals, gtd0, m_sdf,
                                     sc.truncation, w_sdf)
        loss = loss + mc.w_color * losses_lib.color_loss(
            gtc0, out.rgb, inside.astype(jnp.float32))
        loss = loss + mc.w_depth * losses_lib.depth_loss(gtd0, out.depth,
                                                         m_sdf)
        return loss
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_C)), opt_tree)
    print(f"C fixed-rays v&g           {t * 1e3:8.2f} ms")

    # D. fixed rays/z + query + pseudo losses (no sampling/compositing)
    z0 = sampling.z_vals_with_depth(jax.random.PRNGKey(7),
                                    jnp.maximum(gtd0, 1e-6), sc.truncation,
                                    rc.n_stratified, rc.n_importance, True)

    def loss_D(opt_tree):
        pts = rays_o0[:, None, :] + rays_d0[:, None, :] * z0[..., None]
        p_nor = scene_lib.normalize_points(sc, pts.reshape(-1, 3))
        raw = scene_lib.query(opt_tree["scene"], sc, p_nor).reshape(
            z0.shape[0], -1, 4)
        sdf = raw[..., 3]
        m = jnp.ones_like(gtd0)
        loss = losses_lib.sdf_losses(sdf, z0, gtd0, m, sc.truncation, w_sdf)
        loss = loss + jnp.mean(jnp.square(raw[..., :3]))
        return loss
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_D)), opt_tree)
    print(f"D query+sdfloss v&g        {t * 1e3:8.2f} ms")

    # E. C without perturb (kills one random uniform + lerp)
    rc_np = rc._replace(perturb=False)

    def loss_E(opt_tree):
        out = renderer.render_rays(opt_tree["scene"], sc, rc_np, rays_o0,
                                   rays_d0, gtd0, krender0)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_E)), opt_tree)
    print(f"E no-perturb no-loss v&g   {t * 1e3:8.2f} ms")

    # F. gt_depth strictly >0 so the no-depth cond branch predicate is
    #    False at runtime; verify by timing with a forced-positive depth
    def loss_F(opt_tree):
        gtd = jnp.maximum(gtd0, 0.1)
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o0,
                                   rays_d0, gtd, krender0)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_F)), opt_tree)
    print(f"F forced-depth v&g         {t * 1e3:8.2f} ms")

    print("gtd0 min/max:", float(jnp.min(gtd0)), float(jnp.max(gtd0)),
          " zeros:", int(jnp.sum(gtd0 <= 0)))


# Bisect the mapping batch assembly's 48 ms overhead (see profile_map4:
# B=80ms vs C2=32ms). Incrementally re-enable assembly stages under the grad.
def variant_5():
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine.slam import UniSLAM
    from unislam_tpu.render import renderer

    print("device:", jax.devices()[0])
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    cfg = make_config(ds, {
        "tracking": {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                     "ignore_edge_H": 75},
        "mapping": {"pixels": 4000, "iters": 15, "iters_first": 15,
                    "every_frame": 4, "keyframe_every": 4},
        "rendering": {"n_stratified": 32, "n_importance": 8},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 "encoding": "brick", "brick_levels": 4,
                 "brick_features": 8, "brick_hash_size": 16},
    })
    slam = UniSLAM(cfg, ds, seed=0)
    slam.step_frame(0)
    slam.step_frame(1)

    sc, rc, mc = slam.sc, slam.rc, slam.mc
    color, depth, _ = slam._frame(2)
    bank = slam.bank
    max_kf = slam.max_kf
    bank_size = slam.bank_size
    n_rays = mc.pixels + mc.extra_rays
    HW = intr.H * intr.W

    poses = jnp.concatenate(
        [bank.pose7, pose_lib.matrix_to_cam_pose(
            jnp.asarray(slam.est_c2w[1])[None])], axis=0)
    opt_tree = {"scene": slam.params, "poses": poses}
    key = jax.random.PRNGKey(42)

    # precomputed concrete draws
    k_slot, k_extra, k_pix_b, k_pix_c, k_render = jax.random.split(key, 5)
    probs = np.zeros(max_kf + 1, np.float32)
    probs[[0, 1, max_kf]] = 1 / 3
    probs_j = jnp.asarray(probs)
    slot0 = jax.random.categorical(k_slot, jnp.log(probs_j + 1e-20),
                                   shape=(n_rays,))
    pix_b0 = jax.random.randint(k_pix_b, (n_rays,), 0, bank_size)
    pix_c0 = jax.random.randint(k_pix_c, (n_rays,), 0, HW)
    cur_depth, cur_color, cur_rays_d = depth, color, slam.cam_rays_d

    def gather_gt(slot, pix_b, pix_c):
        is_cur = slot == max_kf
        kf_slot = jnp.minimum(slot, max_kf - 1)
        gtd = jnp.where(is_cur, cur_depth.reshape(-1)[pix_c],
                        bank.depth[kf_slot, pix_b])
        gtc = jnp.where(is_cur[:, None], cur_color.reshape(-1, 3)[pix_c],
                        bank.color[kf_slot, pix_b])
        dirc = jnp.where(is_cur[:, None], cur_rays_d.reshape(-1, 3)[pix_c],
                         bank.rays_d[kf_slot, pix_b])
        return gtd, gtc, dirc

    gtd0, gtc0, dirc0 = jax.jit(gather_gt)(slot0, pix_b0, pix_c0)

    def render_sum(scene, rays_o, rays_d, gtd, k):
        out = renderer.render_rays(scene, sc, rc, rays_o, rays_d, gtd, k)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)

    # V0 = C2 baseline: everything precomputed
    rot0 = pose_lib.cam_pose_to_matrix(poses)[slot0, :3, :3]
    rayd0 = jnp.einsum("nij,nj->ni", rot0, dirc0)
    rayo0 = pose_lib.cam_pose_to_matrix(poses)[slot0, :3, 3]

    def loss_V0(opt_tree, rays_o, rays_d, gtd, k):
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, k)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V0)), opt_tree, rayo0,
                  rayd0, gtd0, k_render)
    print(f"V0 baseline (=C2)          {t * 1e3:8.2f} ms")

    # V1: + pose chain (slot/pix/dir/gt concrete)
    def loss_V1(opt_tree, slot, dirc, gtd, k):
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, k)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V1)), opt_tree, slot0,
                  dirc0, gtd0, k_render)
    print(f"V1 +pose chain             {t * 1e3:8.2f} ms")

    # V2: + bank gathers (slot/pix concrete)
    def loss_V2(opt_tree, slot, pix_b, pix_c, k):
        gtd, gtc, dirc = gather_gt(slot, pix_b, pix_c)
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, k) \
            + 0.0 * jnp.sum(gtc)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V2)), opt_tree, slot0,
                  pix_b0, pix_c0, k_render)
    print(f"V2 +bank gathers           {t * 1e3:8.2f} ms")

    # V3: + RNG draws inside (full assembly)
    def loss_V3(opt_tree, sel_probs, k):
        ks, ke, kb, kc, kr = jax.random.split(k, 5)
        slot_main = jax.random.categorical(
            ks, jnp.log(sel_probs + 1e-20), shape=(mc.pixels,))
        slot_extra = jax.random.categorical(
            ke, jnp.log(sel_probs + 1e-20), shape=(mc.extra_rays,))
        slot = jnp.concatenate([slot_main, slot_extra])
        pix_b = jax.random.randint(kb, (n_rays,), 0, bank_size)
        pix_c = jax.random.randint(kc, (n_rays,), 0, HW)
        gtd, gtc, dirc = gather_gt(slot, pix_b, pix_c)
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, kr) \
            + 0.0 * jnp.sum(gtc)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V3)), opt_tree, probs_j,
                  key)
    print(f"V3 +rng draws (=B)         {t * 1e3:8.2f} ms")

    # V3b: RNG draws but gt/dir STILL concrete (only slot used downstream)
    def loss_V3b(opt_tree, sel_probs, k):
        ks, ke, kb, kc, kr = jax.random.split(k, 5)
        slot_main = jax.random.categorical(
            ks, jnp.log(sel_probs + 1e-20), shape=(mc.pixels,))
        slot_extra = jax.random.categorical(
            ke, jnp.log(sel_probs + 1e-20), shape=(mc.extra_rays,))
        slot = jnp.concatenate([slot_main, slot_extra])
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc0)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd0, kr)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V3b)), opt_tree, probs_j,
                  key)
    print(f"V3b rng slot only          {t * 1e3:8.2f} ms")

    # V4: RNG draws alone (no render): how slow is threefry here?
    def draws(k):
        ks, ke, kb, kc, kr = jax.random.split(k, 5)
        slot_main = jax.random.categorical(
            ks, jnp.log(probs_j + 1e-20), shape=(mc.pixels,))
        pix_b = jax.random.randint(kb, (n_rays,), 0, bank_size)
        pix_c = jax.random.randint(kc, (n_rays,), 0, HW)
        return (jnp.sum(slot_main) + jnp.sum(pix_b) + jnp.sum(pix_c))
    t, _ = timeit(jax.jit(draws), key)
    print(f"V4 rng draws alone fwd     {t * 1e3:8.2f} ms")


# Verify the one-hot pose-selection fix: time the real fused mapping phase
# and tracking, post-fix. Also measure the RNG draw cost inside the loop.
def variant_6():
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine import mapper as mapper_lib
    from unislam_tpu.engine import selection as selection_lib
    from unislam_tpu.engine.slam import UniSLAM

    print("device:", jax.devices()[0])
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    cfg = make_config(ds, {
        "tracking": {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                     "ignore_edge_H": 75},
        "mapping": {"pixels": 4000, "iters": 15, "iters_first": 15,
                    "every_frame": 4, "keyframe_every": 4},
        "rendering": {"n_stratified": 32, "n_importance": 8, "n_fine": 16},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 "encoding": "brick", "brick_levels": 4,
                 "brick_features": 8, "brick_hash_size": 16},
    })
    slam = UniSLAM(cfg, ds, seed=0)
    slam.step_frame(0)
    slam.step_frame(1)

    color, depth, _ = slam._frame(2)
    count = int(slam.bank.count)
    probs, extra = selection_lib.window_probs(
        slam.max_kf, count, np.zeros(slam.max_kf, bool))
    pg = np.zeros((slam.max_kf + 1, 1), np.float32)
    pg[[0, slam.max_kf], 0] = 1.0
    # COPY the scene params: map_phase donates its opt_tree, and the
    # tracking timing below still needs slam.params live
    opt_tree = {"scene": jax.tree_util.tree_map(jnp.copy, slam.params),
                "poses": jnp.concatenate(
                    [slam.bank.pose7,
                     pose_lib.matrix_to_cam_pose(
                         jnp.asarray(slam.est_c2w[1])[None])], axis=0)}
    probs_j = jnp.asarray(probs, jnp.float32)
    extra_j = jnp.asarray(extra, jnp.float32)
    pg_j = jnp.asarray(pg)
    key = jax.random.PRNGKey(42)

    # phase donates opt_tree/opt_state -> rebind outputs between calls
    ot = jax.tree_util.tree_map(jnp.copy, opt_tree)
    ms = slam.map_opt.init(ot)
    for _ in range(2):
        ot, ms, ml = slam.map_phase(ot, ms, slam.bank, depth, color,
                                    slam.cam_rays_d, probs_j, extra_j, pg_j,
                                    key, jnp.int32(15), jnp.float32(1.0))
    _fetch(ml)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        ot, ms, ml = slam.map_phase(ot, ms, slam.bank, depth, color,
                                    slam.cam_rays_d, probs_j, extra_j, pg_j,
                                    key, jnp.int32(15), jnp.float32(1.0))
    _fetch(ml)
    t = (time.time() - t0) / reps
    print(f"map phase n=15 per-iter  {t / 15 * 1e3:8.2f} ms")

    loss_fn = mapper_lib.make_loss_fn(slam.sc, slam.rc, slam.mc, slam.intr,
                                      slam.max_kf, slam.bank_size)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    t, _ = timeit(vg, opt_tree, slam.bank, depth, color, slam.cam_rays_d,
                  probs_j, extra_j, pg_j, key)
    print(f"map loss v&g single      {t * 1e3:8.2f} ms")

    lf = jax.jit(loss_fn)
    t, _ = timeit(lf, opt_tree, slam.bank, depth, color, slam.cam_rays_d,
                  probs_j, extra_j, pg_j, key)
    print(f"map loss fwd only        {t * 1e3:8.2f} ms")

    pose7 = pose_lib.matrix_to_cam_pose(jnp.asarray(slam.est_c2w[1])[None])[0]
    pose = {"R": pose7[:4], "T": pose7[4:]}
    tstate = slam.track_opt.init(pose)
    t, _ = timeit(slam.track_frame_fn, slam.params, pose, tstate, depth,
                  color, key, jnp.int32(8), reps=6)
    print(f"track frame n=8 per-iter {t / 8 * 1e3:8.2f} ms")


VARIANTS = {1: variant_1, 2: variant_2, 3: variant_3, 4: variant_4,
            5: variant_5, 6: variant_6}
NAMES = {"stages": 1, "micro": 2, "real": 3, "surgical": 4,
         "assembly": 5, "posefix": 6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="1",
                    help="1..6 or a name: " + ", ".join(NAMES))
    args = ap.parse_args()
    v = NAMES.get(args.variant, None)
    if v is None:
        v = int(args.variant)
    VARIANTS[v]()


if __name__ == "__main__":
    main()
