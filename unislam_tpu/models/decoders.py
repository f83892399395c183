"""Tiny SDF / RGB MLP decoders as plain parameter pytrees.

TPU-native replacement for the reference's decoders
(/root/reference/src/networks/decoders.py:24-205), BOTH paths:
- vanilla (`tcnn_network: False`, ref decoders.py:72-85): `n_blocks`
  hidden linears with biases plus an output linear, f32 — the reference's
  exactly-reproducible branch (`init_mlp`).
- fused (`tcnn_network: True`, ref decoders.py:49-70 tcnn.FullyFusedMLP):
  bias-free, `n_blocks - 1` hidden layers, half-precision compute — here
  bf16 matmuls with f32 MXU accumulation (`init_fused_mlp`).

`mlp_apply` serves both; the variant rides in the parameter structure.

At width 16 these matmuls are tiny; XLA fuses them into the surrounding
elementwise work (profiled at <1 ms per mapping iteration, BENCHLOG.md —
a hand-written Pallas fusion has nothing left to win here).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_mlp(key: jax.Array, in_dim: int, hidden: int, out_dim: int,
             n_blocks: int = 2, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """PyTorch nn.Linear-style init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weights and biases (reference decoders.py:74-84 use default init)."""
    dims = [in_dim] + [hidden] * n_blocks + [out_dim]
    params = {}
    for li, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(d_in)
        params[f"w{li}"] = jax.random.uniform(
            kw, (d_in, d_out), dtype=dtype, minval=-bound, maxval=bound)
        params[f"b{li}"] = jax.random.uniform(
            kb, (d_out,), dtype=dtype, minval=-bound, maxval=bound)
    return params


def init_fused_mlp(key: jax.Array, in_dim: int, hidden: int, out_dim: int,
                   n_blocks: int = 2) -> Dict[str, jnp.ndarray]:
    """The reference's second decoder path (`tcnn_network: True` ->
    tcnn.FullyFusedMLP, decoders.py:49-70): bias-free linears,
    `n_blocks - 1` hidden layers of `hidden` neurons, half-precision
    compute. TPU mapping: weights stay f32 in the pytree (Adam moments in
    full precision, as tcnn's optimizer does internally) and are cast to
    bf16 inside apply with f32 MXU accumulation. At width 16 this is not a
    speed play — decoders are <1 ms/iter either way (BENCHLOG.md) — it is
    config-surface parity plus the lower-memory decoder option."""
    dims = [in_dim] + [hidden] * max(n_blocks - 1, 0) + [out_dim]
    params = {}
    for li, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, kw = jax.random.split(key)
        bound = 1.0 / jnp.sqrt(d_in)
        params[f"w{li}"] = jax.random.uniform(
            kw, (d_in, d_out), dtype=jnp.float32, minval=-bound,
            maxval=bound)
    return params


def _finalize(out: jnp.ndarray, final_activation: str) -> jnp.ndarray:
    if final_activation == "tanh":
        return jnp.tanh(out)
    if final_activation == "sigmoid":
        return jax.nn.sigmoid(out)
    return out


def mlp_apply(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
              final_activation: str) -> jnp.ndarray:
    """Apply either decoder variant: ReLU between layers, tanh/sigmoid/none
    on the output. The variant is carried by the parameter structure —
    bias-free pytrees (init_fused_mlp) run the bf16 fused path, biased ones
    (init_mlp) the f32 vanilla path — so every query site supports both."""
    if "b0" not in params:
        n_layers = len(params)
        h = x.astype(jnp.bfloat16)
        for li in range(n_layers - 1):
            h = jnp.maximum(
                jnp.dot(h, params[f"w{li}"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32),
                0.0).astype(jnp.bfloat16)
        out = jnp.dot(h, params[f"w{n_layers - 1}"].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return _finalize(out, final_activation)

    n_layers = len(params) // 2
    h = x
    for li in range(n_layers - 1):
        h = jnp.maximum(
            jnp.dot(h, params[f"w{li}"], preferred_element_type=jnp.float32)
            + params[f"b{li}"], 0.0)
    li = n_layers - 1
    out = jnp.dot(h, params[f"w{li}"], preferred_element_type=jnp.float32) \
        + params[f"b{li}"]
    return _finalize(out, final_activation)
