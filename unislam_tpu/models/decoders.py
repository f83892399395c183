"""Tiny SDF / RGB MLP decoders as plain parameter pytrees.

TPU-native replacement for the reference's decoders
(/root/reference/src/networks/decoders.py:24-205): an SDF head (tanh) and a
color head (sigmoid), each `c_dim -> hidden -> ... -> out` with ReLU, fed by
hash-grid features. Structure matches the reference's vanilla
(`tcnn_network: False`) path — `n_blocks` hidden linears with biases plus an
output linear — which is its exactly-reproducible branch.

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


def mlp_apply(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
              final_activation: str) -> jnp.ndarray:
    """Apply the MLP: ReLU between layers, tanh/sigmoid/none on the output."""
    n_layers = len(params) // 2
    h = x
    for li in range(n_layers - 1):
        h = jnp.maximum(
            jnp.dot(h, params[f"w{li}"], preferred_element_type=jnp.float32)
            + params[f"b{li}"], 0.0)
    li = n_layers - 1
    out = jnp.dot(h, params[f"w{li}"], preferred_element_type=jnp.float32) \
        + params[f"b{li}"]
    if final_activation == "tanh":
        return jnp.tanh(out)
    if final_activation == "sigmoid":
        return jax.nn.sigmoid(out)
    return out
