"""Microbenchmark: the (REJECTED) Pallas fused dense-level encode vs the
XLA one-hot path. See examples/pallas_fused_dense.py for the verdict.
NB round-2 lesson: standalone dispatch timings here carry ~1.4 ms of relay
overhead per call; chained-in-jit probes (BENCHLOG round 2) are the truth.

Shapes mirror the Replica mapping iteration (bench.py): coarse levels
(res 16 + 20, 1512 rows) at 168k points, hashed-matmul level (res 128,
4096 rows) at 50k points. Timed outputs are scalars (axon relay: fetch a
value, never trust block_until_ready — see .claude/skills/verify).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo/examples")
import pallas_fused_dense as fd

F = 8
D = 27 * F


class Lvl:
    def __init__(self, res, brick_res, rows, offset, hashed):
        self.res, self.brick_res = res, brick_res
        self.rows, self.offset, self.hashed = rows, offset, hashed


def index_math(pts, lvls):
    """XLA-side per-level idx/local/frac (lane-dense, fused)."""
    p = jnp.clip(pts, 0.0, 1.0)
    idxs, locals_, fracs = [], [], []
    for m in lvls:
        pos = p * (m.res - 1.0)
        cell = jnp.clip(jnp.floor(pos), 0.0, m.res - 2.0)
        frac = pos - cell
        cell = cell.astype(jnp.int32)
        brick = cell // 2
        local = cell - 2 * brick
        if m.hashed:
            ub = brick.astype(jnp.uint32)
            h = (ub[:, 0] * np.uint32(1)) ^ \
                (ub[:, 1] * np.uint32(2654435761)) ^ \
                (ub[:, 2] * np.uint32(805459861))
            idx = (h % np.uint32(m.rows)).astype(jnp.int32)
        else:
            idx = jnp.minimum(brick[:, 0] + brick[:, 1] * m.brick_res
                              + brick[:, 2] * m.brick_res ** 2, m.rows - 1)
        idxs.append(idx[:, None])
        locals_.append(local)
        fracs.append(frac)
    return (jnp.concatenate(idxs, 1), jnp.concatenate(locals_, 1),
            jnp.concatenate(fracs, 1))


def xla_onehot_encode(table, pts, lvls):
    """The round-1 XLA path: materialized one-hot + dot + interp einsum."""
    idx, local, frac = index_math(pts, lvls)
    feats = []
    for k, m in enumerate(lvls):
        onehot = (idx[:, k:k + 1] == jnp.arange(m.rows)[None, :]
                  ).astype(jnp.bfloat16)
        rows = jnp.dot(onehot, table[m.offset:m.offset + m.rows],
                       preferred_element_type=jnp.float32)
        planes = jnp.arange(3)

        def axis_w(a):
            lo = (planes[None, :] == local[:, 3 * k + a:3 * k + a + 1])
            hi = (planes[None, :] == local[:, 3 * k + a:3 * k + a + 1] + 1)
            return lo * (1 - frac[:, 3 * k + a:3 * k + a + 1]) \
                + hi * frac[:, 3 * k + a:3 * k + a + 1]

        wx, wy, wz = axis_w(0), axis_w(1), axis_w(2)
        w = (wx[:, :, None, None] * wy[:, None, :, None]
             * wz[:, None, None, :]).reshape(-1, 27)
        feats.append(jnp.einsum("nv,nvf->nf", w, rows.reshape(-1, 27, F)))
    return jnp.concatenate(feats, axis=1)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    float(out[0] if isinstance(out, tuple) else out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s = float(out[0] if isinstance(out, tuple) else out)
    return (time.time() - t0) / reps * 1e3, s


def run(name, lvls, N):
    metas = tuple(fd.LevelMeta(rows=m.rows, offset=m.offset) for m in lvls)
    T = sum(m.rows for m in lvls)
    L = len(lvls)
    key = jax.random.PRNGKey(0)
    table = (jax.random.normal(key, (T, D), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (N, L * F))

    @jax.jit
    def pallas_fwd(t, p):
        idx, local, frac = index_math(p, lvls)
        feat, rows = fd.encode_fwd(t, idx, local, frac, metas, F)
        return jnp.sum(feat)

    @jax.jit
    def pallas_fb(t, p):
        idx, local, frac = index_math(p, lvls)
        feat, rows = fd.encode_fwd(t, idx, local, frac, metas, F)
        gt, gf = fd.encode_bwd(idx, local, frac, rows, g, metas, F, T)
        return jnp.sum(feat) + jnp.sum(gt) + jnp.sum(gf)

    xla_fwd = jax.jit(lambda t, p: jnp.sum(xla_onehot_encode(t, p, lvls)))

    def xla_loss(tf32, p):
        return jnp.sum(xla_onehot_encode(tf32.astype(jnp.bfloat16), p, lvls)
                       * g)

    @jax.jit
    def xla_fb(t, p):
        gt, gp = jax.grad(xla_loss, argnums=(0, 1))(t, p)
        return jnp.sum(xla_onehot_encode(t.astype(jnp.bfloat16), p, lvls)) \
            + jnp.sum(gt) + jnp.sum(gp)

    tf32 = table.astype(jnp.float32)
    for label, fn, args in [("pallas fwd", pallas_fwd, (table, pts)),
                            ("pallas fwd+bwd", pallas_fb, (table, pts)),
                            ("xla fwd", xla_fwd, (table, pts)),
                            ("xla fwd+bwd(grad)", xla_fb, (tf32, pts))]:
        ms, s = timeit(fn, *args)
        print(f"{name:8s} {label:18s} {ms:8.3f} ms   (checksum {s:.3e})")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    coarse = [Lvl(16, 8, 512, 0, False), Lvl(20, 10, 1000, 512, False)]
    fine = [Lvl(128, 64, 4096, 0, True)]
    run("coarse", coarse, 168000)
    run("fine", fine, 50400)
