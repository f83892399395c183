"""Low-precision-state Adam for the grid tables.

The mapping phase's Adam sweep over the brick/hash table is pure HBM
traffic: read grad + param + mu + nu, write param + mu + nu — ~500 MB/iter
at room0 scale, 0.90 ms/iter measured on TPU v5e (round-3 trace,
multiply_add_fusion.123), second only to the fine-level scatter. The
reference's torch.optim.Adam keeps fp32 state (and tcnn's fused adam keeps
fp32 moments even for fp16 params); on TPU the moments can live in bf16,
removing ~30% of the sweep's bytes, IF the exponential moving averages stay
unbiased.

Plain round-to-nearest bf16 is NOT safe for `nu`: with b2=0.999 the
per-step increment is ~0.1% of the steady-state value — below bf16's ~0.4%
resolution — so nu would freeze at its high-water mark (EMA stalling, the
classic low-precision-EMA failure). Fix: STOCHASTIC ROUNDING on the state
store. E[SR(x)] = x, so the EMA recursion stays unbiased; the rounding
noise is zero-mean and averaged down by the EMA itself. The random bits
come from a per-element integer hash (fingerprint of linear index x step
count) — 4 VPU int ops/element that fuse into the HBM-bound Adam fusion,
not a separate threefry pass.

All arithmetic (EMA update, bias correction, the returned update) is f32;
only the *stored* moments are bf16. `optax.adam` remains the default for
decoder/pose groups (tiny tensors; nothing to win).
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class ScaleByAdamLPState(NamedTuple):
    count: chex.Array       # ()
    mu: optax.Updates       # bf16 (or state_dtype) tree
    nu: optax.Updates


def _sr_round(x: jnp.ndarray, salt: jnp.ndarray, dtype) -> jnp.ndarray:
    """Stochastically round f32 -> bf16. bf16 is the top 16 bits of f32, so
    adding uniform-[0, 2^16) noise to the low mantissa bits before
    truncation gives exact stochastic rounding: P(round up) equals the
    fractional position between the two representable neighbours."""
    if dtype != jnp.bfloat16:
        return x.astype(dtype)
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    idx = jax.lax.iota(jnp.uint32, xf.size).reshape(xf.shape)
    # murmur3-style finalizer over (index*odd ^ salt): cheap, fuses, and
    # decorrelated across steps because `salt` folds in the Adam step count.
    # The multiply (golden-ratio odd constant) decorrelates *sequential*
    # indices before the finalizer: feeding raw iota leaves the low 16 bits
    # slightly non-equidistributed over contiguous windows (measured
    # round-up fraction 0.5074 at a 20k window -> a deterministic EMA bias
    # ~3x the statistical floor; with the multiply it sits at the floor).
    h = (idx * jnp.uint32(0x9E3779B1)) ^ salt
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    up = bits + (h & jnp.uint32(0xFFFF))
    # Guard the exponent-overflow edge (x near f32 max / inf): keep RTN there.
    safe = (bits & jnp.uint32(0x7F800000)) != jnp.uint32(0x7F800000)
    up = jnp.where(safe, up, bits)
    return jax.lax.bitcast_convert_type(
        (up >> 16).astype(jnp.uint16), jnp.bfloat16)


def scale_by_adam_lp(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                     state_dtype=jnp.bfloat16,
                     stochastic_round: bool = True
                     ) -> optax.GradientTransformation:
    """`optax.scale_by_adam` with the moment state stored in `state_dtype`
    (default bf16 + stochastic rounding). Exact drop-in: with
    state_dtype=float32 it is bit-identical to optax's (same bias
    correction, eps placement outside the sqrt)."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, state_dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, state_dtype), params)
        return ScaleByAdamLPState(count=jnp.zeros([], jnp.int32),
                                  mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.float32(b1) ** c
        bc2 = 1.0 - jnp.float32(b2) ** c
        salt = (count.astype(jnp.uint32) * jnp.uint32(2654435761)
                ) ^ jnp.uint32(0x9E3779B9)

        leaves_g, treedef = jax.tree_util.tree_flatten(updates)
        leaves_mu = treedef.flatten_up_to(state.mu)
        leaves_nu = treedef.flatten_up_to(state.nu)
        new_updates, new_mu, new_nu = [], [], []
        for k, (g, m, v) in enumerate(zip(leaves_g, leaves_mu, leaves_nu)):
            gf = g.astype(jnp.float32)
            mf = m.astype(jnp.float32) * b1 + gf * (1.0 - b1)
            vf = v.astype(jnp.float32) * b2 + gf * gf * (1.0 - b2)
            upd = (mf / bc1) / (jnp.sqrt(vf / bc2) + eps)
            new_updates.append(upd.astype(g.dtype))
            # mask to 32 bits: the Python-int product overflows uint32 for
            # any leaf index k >= 1 and jnp.uint32() raises on it
            leaf_salt = salt ^ jnp.uint32((0x61C88647 * (2 * k + 1))
                                          & 0xFFFFFFFF)
            if stochastic_round:
                new_mu.append(_sr_round(mf, leaf_salt, state_dtype))
                new_nu.append(_sr_round(vf, leaf_salt ^ jnp.uint32(0xA5A5A5A5),
                                        state_dtype))
            else:
                new_mu.append(mf.astype(state_dtype))
                new_nu.append(vf.astype(state_dtype))
        return (jax.tree_util.tree_unflatten(treedef, new_updates),
                ScaleByAdamLPState(
                    count=count,
                    mu=jax.tree_util.tree_unflatten(treedef, new_mu),
                    nu=jax.tree_util.tree_unflatten(treedef, new_nu)))

    return optax.GradientTransformation(init_fn, update_fn)


def adam_lp(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
            eps: float = 1e-8, state_dtype=jnp.bfloat16,
            stochastic_round: bool = True) -> optax.GradientTransformation:
    """Adam with low-precision moment state (see scale_by_adam_lp)."""
    return optax.chain(
        scale_by_adam_lp(b1=b1, b2=b2, eps=eps, state_dtype=state_dtype,
                         stochastic_round=stochastic_round),
        optax.scale(-learning_rate))
