"""Decompose the LOD mapping iteration: coarse (matmul-level) encode at
168k pts, fine (hashed-level) encode at 67k pts, MLP heads, and the
selection/spread einsums.

Usage: python examples/profile_lod.py
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
from unislam_tpu.models import decoders


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
    R, S, K = 4200, 40, 16
    Nc, Nf = R * S, R * K
    spec = be.make_spec(n_levels=4, n_features=8, log2_hashmap_size=16,
                        base_resolution=16, desired_resolution=816,
                        matmul_max_rows=4096)
    coarse, fine = be.coarse_fine_split(spec)
    print("coarse:", coarse, "fine:", fine)
    table = be.init_table(jax.random.PRNGKey(0), spec)
    pts_c = jax.random.uniform(jax.random.PRNGKey(1), (Nc, 3))
    pts_f = jax.random.uniform(jax.random.PRNGKey(2), (Nf, 3))

    for name, pts, lv in [("coarse@168k", pts_c, coarse),
                          ("fine@67k", pts_f, fine),
                          ("fine@168k", pts_c, fine)]:
        enc = jax.jit(lambda t, p, lv=lv: be.encode(t, p, spec, lv))
        t, _ = timeit(enc, table, pts)

        def loss(t_, p_, lv=lv):
            return jnp.sum(be.encode(t_, p_, spec, lv) ** 2)
        vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        tg, _ = timeit(vg, table, pts)
        print(f"{name:14s} fwd {t*1e3:7.2f} ms   v&g {tg*1e3:7.2f} ms")

    # MLP heads at 168k x 32 features
    mlp_s = decoders.init_mlp(jax.random.PRNGKey(3), 32, 16, 1, 2)
    mlp_c = decoders.init_mlp(jax.random.PRNGKey(4), 32, 16, 3, 2)
    feat = jax.random.normal(jax.random.PRNGKey(5), (Nc, 32))

    def heads(ms, mc, f):
        return (jnp.sum(decoders.mlp_apply(ms, f, "tanh") ** 2)
                + jnp.sum(decoders.mlp_apply(mc, f, "sigmoid") ** 2))
    vg = jax.jit(jax.value_and_grad(heads, argnums=(0, 1, 2)))
    t, _ = timeit(vg, mlp_s, mlp_c, feat)
    print(f"MLP heads v&g @168k       {t*1e3:7.2f} ms")

    # selection einsums
    p3 = pts_c.reshape(R, S, 3)
    sel = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(6), (R, K), 0, S), S)

    def sel_spread(p_, sel_):
        fp = jnp.einsum("rks,rsc->rkc", sel_, p_)
        ff = jnp.einsum("rks,rkf->rsf", sel_, jnp.tile(fp, (1, 1, 6))[..., :16])
        return jnp.sum(ff ** 2)
    vg = jax.jit(jax.value_and_grad(sel_spread))
    t, _ = timeit(vg, p3, sel)
    print(f"select+spread einsums v&g {t*1e3:7.2f} ms")

    # trivial dispatch floor
    one = jnp.ones((8, 128))
    f0 = jax.jit(lambda x: jnp.sum(x * 2))
    t, _ = timeit(f0, one, reps=20)
    print(f"dispatch floor            {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
