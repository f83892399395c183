"""core/optim.py: low-precision-state Adam for the grid tables.

- f32 state mode must be bit-identical to optax.adam (drop-in claim).
- bf16 + stochastic rounding must keep the nu EMA unbiased where plain
  round-to-nearest provably stalls it (the reason the module exists).
- the mapping optimizer built with adam_state_dtype="bfloat16" must step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unislam_tpu.core.optim import _sr_round, adam_lp, scale_by_adam_lp


def test_f32_mode_matches_optax_adam():
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(64, 33),
                               jnp.float32)}
    ref = optax.adam(0.05)
    lp = adam_lp(0.05, state_dtype=jnp.float32)
    s_ref, s_lp = ref.init(params), lp.init(params)
    p_ref, p_lp = params, params
    rng = np.random.RandomState(1)
    for _ in range(5):
        g = {"w": jnp.asarray(rng.randn(64, 33), jnp.float32)}
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_lp, s_lp = lp.update(g, s_lp, p_lp)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_lp = optax.apply_updates(p_lp, u_lp)
    np.testing.assert_array_equal(np.asarray(p_ref["w"]),
                                  np.asarray(p_lp["w"]))


@pytest.mark.parametrize("salt", [1234, 7, 0])
def test_sr_round_unbiased(salt):
    # x exactly halfway between two bf16 neighbours (ulp at 1.0 is 2^-7):
    # SR must round up ~50% of the time. n = 2^20 puts the statistical
    # floor (ulp * sqrt(0.25/n)) at ~3.8e-6, so 2e-5 is a ~5-sigma bound —
    # at the old n=20k the floor itself was ~2.7e-5 and the bound was a
    # coin flip even for a perfect hash.
    n = 1 << 20
    x = jnp.full((n,), 1.0 + 1.0 / 256.0, jnp.float32)
    out = _sr_round(x, jnp.uint32(salt), jnp.bfloat16)
    frac_up = float(jnp.mean((out.astype(jnp.float32) > 1.0)))
    assert 0.45 < frac_up < 0.55, frac_up
    # expectation preserved to ~5x ulp/sqrt(n)
    err = abs(float(jnp.mean(out.astype(jnp.float32))) - float(x[0]))
    assert err < 2e-5, err


def test_sr_round_small_window_equidistribution():
    """Regression for the round-3 red test: over a CONTIGUOUS 20k window
    (the scale of one table's rows) the round-up fraction must sit at the
    statistical floor, not carry a deterministic bias. The raw-iota hash
    measured 0.5074 here; bound 0.506 ~= 0.5 + 1.7 sigma."""
    x = jnp.full((20000,), 1.0 + 1.0 / 256.0, jnp.float32)
    for salt in (1234, 7, 999999, 0):
        out = _sr_round(x, jnp.uint32(salt), jnp.bfloat16)
        frac_up = float(jnp.mean((out.astype(jnp.float32) > 1.0)))
        assert 0.494 < frac_up < 0.506, (salt, frac_up)


def test_sr_round_exact_values_unchanged():
    x = jnp.asarray([0.0, 1.0, -2.0, 0.5, -0.25], jnp.float32)  # bf16-exact
    out = _sr_round(x, jnp.uint32(7), jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(x))


def test_bf16_ema_tracks_where_rtn_stalls():
    """nu EMA with constant g: converges to g^2. Increments are 0.1% of the
    steady state — below bf16 resolution, so RTN freezes early while SR
    keeps tracking."""
    g = jnp.full((4096,), 3.0, jnp.float32)
    params = {"w": jnp.zeros((4096,), jnp.float32)}
    tx_sr = scale_by_adam_lp(state_dtype=jnp.bfloat16, stochastic_round=True)
    tx_rtn = scale_by_adam_lp(state_dtype=jnp.bfloat16,
                              stochastic_round=False)
    s_sr, s_rtn = tx_sr.init(params), tx_rtn.init(params)
    for _ in range(400):
        _, s_sr = tx_sr.update({"w": g}, s_sr)
        _, s_rtn = tx_rtn.update({"w": g}, s_rtn)
    target = 9.0 * (1.0 - 0.999 ** 400)          # unbiased EMA value
    nu_sr = float(jnp.mean(s_sr.nu["w"].astype(jnp.float32)))
    nu_rtn = float(jnp.mean(s_rtn.nu["w"].astype(jnp.float32)))
    assert abs(nu_sr - target) / target < 0.02, (nu_sr, target)
    # RTN stalls: by step 400 it must have lost a visible chunk of the EMA
    assert nu_rtn < nu_sr - 0.05 * target, (nu_rtn, nu_sr, target)


def test_adam_lp_converges_quadratic():
    # minimize ||p - t||^2 with bf16-state adam: must reach t closely
    t = jnp.asarray(np.random.RandomState(3).randn(512), jnp.float32)
    p = {"w": jnp.zeros((512,), jnp.float32)}
    tx = adam_lp(0.05)
    s = tx.init(p)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda q: jnp.sum((q["w"] - t) ** 2))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(300):
        p, s = step(p, s)
    assert float(jnp.max(jnp.abs(p["w"] - t))) < 0.02


def test_adam_lp_multi_leaf_tree():
    """Regression: the per-leaf salt used an unmasked Python-int product
    that overflowed uint32 for leaf index k >= 1, crashing adam_lp on any
    params tree with more than one leaf under NumPy 2.x."""
    p = {"a": jnp.ones((16,), jnp.float32),
         "b": jnp.ones((8, 3), jnp.float32),
         "c": jnp.ones((4,), jnp.float32)}
    tx = adam_lp(0.01, stochastic_round=True)
    s = tx.init(p)
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    for _ in range(3):
        u, s = tx.update(g, s, p)
        p = optax.apply_updates(p, u)
    assert float(p["b"][0, 0]) != 1.0


def test_mapping_optimizer_rejects_bad_dtype():
    from unislam_tpu.engine import mapper as mapper_lib
    mc = mapper_lib.MapperConfig(adam_state_dtype="bf16")
    with pytest.raises(ValueError, match="adam_state_dtype"):
        mapper_lib.make_optimizer(mc)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
def test_mapping_optimizer_builds_and_steps(dtype):
    from unislam_tpu.engine import mapper as mapper_lib
    mc = mapper_lib.MapperConfig(adam_state_dtype=dtype)
    opt = mapper_lib.make_optimizer(mc)
    opt_tree = {"scene": {"table": jnp.ones((32, 8), jnp.float32),
                          "dec_w": jnp.ones((4, 4), jnp.float32)},
                "poses": jnp.zeros((3, 7), jnp.float32)}
    state = opt.init(opt_tree)
    grads = jax.tree_util.tree_map(jnp.ones_like, opt_tree)
    updates, state = opt.update(grads, state, opt_tree)
    new_tree = optax.apply_updates(opt_tree, updates)
    assert float(new_tree["scene"]["table"][0, 0]) != 1.0
    # bf16 mode must actually store bf16 moments (f32 mode: none at all)
    bf16_leaves = [x for x in jax.tree_util.tree_leaves(state)
                   if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert bool(bf16_leaves) == (dtype == "bfloat16")
