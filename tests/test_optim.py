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


def test_sr_round_unbiased():
    # x exactly halfway between two bf16 neighbours (ulp at 1.0 is 2^-7):
    # SR must round up ~50% of the time.
    x = jnp.full((20000,), 1.0 + 1.0 / 256.0, jnp.float32)
    out = _sr_round(x, jnp.uint32(1234), jnp.bfloat16)
    frac_up = float(jnp.mean((out.astype(jnp.float32) > 1.0)))
    assert 0.45 < frac_up < 0.55, frac_up
    # expectation preserved to ~ulp/sqrt(n)
    err = abs(float(jnp.mean(out.astype(jnp.float32))) - float(x[0]))
    assert err < 2e-5, err


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
