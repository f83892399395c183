"""The scene representation: one parameter pytree + pure query functions.

Replaces the reference's shared-memory split of tcnn grids + decoder Module
(/root/reference/src/UNISLAM.py:76-137) with a single JAX pytree

    {"sdf_table", "color_table", "sdf_mlp", "color_mlp", "beta"}

shared trivially between the tracking and mapping phases (same process, same
arrays — the `load_state_dict` copies of Tracker.py:246-269 disappear).

`SceneConfig` carries all static structure (hash specs, bound, hidden sizes);
query functions close over it so jitted callers never retrace.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from unislam_tpu.models import brick_encoding, decoders, hash_encoding
from unislam_tpu.models.brick_encoding import BrickSpec
from unislam_tpu.models.hash_encoding import HashGridSpec


@dataclass(frozen=True)
class SceneConfig:
    """Static scene structure. `bound` is (3, 2) world-space min/max.

    Two encodings:
    - "hash": instant-ngp vertex hashing, the reference-parity mode
      (tcnn semantics, /root/reference/src/UNISLAM.py:224-259).
    - "brick": the TPU-native brick layout (models/brick_encoding.py) —
      one gather row per point per level, one shared table for both heads.
    """
    sdf_spec: HashGridSpec
    color_spec: HashGridSpec
    bound: np.ndarray
    truncation: float
    c_dim: int = 32
    hidden_size: int = 16
    n_blocks: int = 2
    learnable_beta: bool = True
    beta_init: float = 10.0
    encoding: str = "hash"
    brick_spec: BrickSpec | None = None
    # "vanilla" (biased f32 MLPs) or "fused" (the reference's
    # tcnn_network=True FullyFusedMLP path: bias-free, bf16 compute)
    mlp_variant: str = "vanilla"

    @property
    def bound_min(self) -> np.ndarray:
        return self.bound[:, 0]

    @property
    def bound_extent(self) -> np.ndarray:
        return self.bound[:, 1] - self.bound[:, 0]


def make_scene_config(cfg: Dict[str, Any]) -> SceneConfig:
    """Build SceneConfig from a merged YAML config dict.

    Mirrors the reference's bound handling + resolution formula:
    - bound scaled and rounded up to `bound_dividable`
      (/root/reference/src/UNISLAM.py:205-222)
    - desired grid resolution = max scene dim / voxel size
      (/root/reference/src/UNISLAM.py:192-203)
    """
    scale = cfg.get("scale", 1)
    bound = np.array(cfg["mapping"]["bound"], dtype=np.float64) * scale
    dividable = cfg["planes_res"]["bound_dividable"]
    bound[:, 1] = (np.floor((bound[:, 1] - bound[:, 0]) / dividable).astype(int)
                   + 1) * dividable + bound[:, 0]
    dim_max = (bound[:, 1] - bound[:, 0]).max()
    res_sdf = int(dim_max / cfg["grid"]["voxel_sdf"])
    res_color = int(dim_max / cfg["grid"]["voxel_color"])

    sdf_spec = hash_encoding.make_spec(
        log2_hashmap_size=cfg["grid"]["hash_size_sdf"],
        desired_resolution=res_sdf)
    color_spec = hash_encoding.make_spec(
        log2_hashmap_size=cfg["grid"]["hash_size_color"],
        desired_resolution=res_color)

    encoding = cfg["grid"].get("encoding", "hash")
    brick_spec = None
    if encoding == "brick":
        brick_spec = brick_encoding.make_spec(
            n_levels=int(cfg["grid"].get("brick_levels", 4)),
            n_features=int(cfg["grid"].get("brick_features", 8)),
            log2_hashmap_size=int(cfg["grid"].get(
                "brick_hash_size", cfg["grid"]["hash_size_sdf"])),
            base_resolution=int(cfg["grid"].get("brick_base_res", 16)),
            desired_resolution=res_sdf,
            matmul_max_rows=int(cfg["grid"].get("brick_matmul_rows", 4096)),
            matmul_hashed=int(cfg["grid"].get("brick_matmul_hashed", 0)),
            matmul_hashed_rows=int(cfg["grid"].get(
                "brick_matmul_hashed_rows", 4096)),
            hashed_level_rows=cfg["grid"].get("brick_hashed_level_rows"))

    return SceneConfig(
        sdf_spec=sdf_spec,
        color_spec=color_spec,
        bound=bound.astype(np.float32),
        truncation=float(cfg["model"]["truncation"]),
        c_dim=int(cfg["model"]["c_dim"]),
        hidden_size=16,
        n_blocks=2,
        learnable_beta=bool(cfg["rendering"].get("learnable_beta", True)),
        encoding=encoding,
        brick_spec=brick_spec,
        mlp_variant=("fused" if cfg["grid"].get("tcnn_network", False)
                     else "vanilla"),
    )


def init_params(key: jax.Array, sc: SceneConfig) -> Dict[str, Any]:
    """Initialize the full scene parameter pytree."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    init_dec = (decoders.init_fused_mlp if sc.mlp_variant == "fused"
                else decoders.init_mlp)
    if sc.encoding == "brick":
        feat_dim = sc.brick_spec.out_dim
        return {
            "table": brick_encoding.init_table(k1, sc.brick_spec),
            "sdf_mlp": init_dec(k3, feat_dim, sc.hidden_size, 1,
                                sc.n_blocks),
            "color_mlp": init_dec(k4, feat_dim, sc.hidden_size, 3,
                                  sc.n_blocks),
            "beta": jnp.full((1,), sc.beta_init, dtype=jnp.float32),
        }
    return {
        "sdf_table": hash_encoding.init_table(k1, sc.sdf_spec),
        "color_table": hash_encoding.init_table(k2, sc.color_spec),
        "sdf_mlp": init_dec(k3, sc.sdf_spec.out_dim, sc.hidden_size,
                            1, sc.n_blocks),
        "color_mlp": init_dec(k4, sc.color_spec.out_dim,
                              sc.hidden_size, 3, sc.n_blocks),
        "beta": jnp.full((1,), sc.beta_init, dtype=jnp.float32),
    }


def normalize_points(sc: SceneConfig, pts: jnp.ndarray) -> jnp.ndarray:
    """World points -> [0, 1]^3 (tcnn convention, Renderer.py:136-137)."""
    lo = jnp.asarray(sc.bound_min)
    ext = jnp.asarray(sc.bound_extent)
    return (pts - lo) / ext


def raw_sdf(params: Dict[str, Any], sc: SceneConfig,
            p_nor: jnp.ndarray, levels: tuple = None) -> jnp.ndarray:
    """SDF at normalized points (N, 3) -> (N,). Mirrors decoders.py:107-130.

    `levels` (brick mode only): restrict the encode to a ladder subset; the
    missing levels' features are zero-filled so the MLP input width is
    unchanged (used by the importance-sampling probe under surface-LOD).
    """
    if sc.encoding == "brick":
        feat = brick_encoding.encode(params["table"], p_nor, sc.brick_spec,
                                     levels)
        if levels is not None and len(levels) < sc.brick_spec.n_levels:
            feat = _zero_fill_levels(feat, sc.brick_spec, tuple(levels))
    else:
        feat = hash_encoding.encode(params["sdf_table"], p_nor, sc.sdf_spec)
    return decoders.mlp_apply(params["sdf_mlp"], feat, "tanh")[..., 0]


def _zero_fill_levels(feat: jnp.ndarray, spec, levels: tuple) -> jnp.ndarray:
    """Expand (N, len(levels)*F) features to the full (N, L*F) width with
    zeros at the missing levels (level-major feature order)."""
    N = feat.shape[0]
    F = spec.n_features
    f3 = feat.reshape(N, len(levels), F)
    cols, j = [], 0
    for l in range(spec.n_levels):
        if l in levels:
            cols.append(f3[:, j])
            j += 1
        else:
            cols.append(jnp.zeros((N, F), feat.dtype))
    return jnp.stack(cols, axis=1).reshape(N, spec.n_levels * F)


def raw_rgb(params: Dict[str, Any], sc: SceneConfig,
            p_nor: jnp.ndarray) -> jnp.ndarray:
    """RGB at normalized points (N, 3) -> (N, 3). Mirrors decoders.py:132-155."""
    if sc.encoding == "brick":
        feat = brick_encoding.encode(params["table"], p_nor, sc.brick_spec)
    else:
        feat = hash_encoding.encode(params["color_table"], p_nor,
                                    sc.color_spec)
    return decoders.mlp_apply(params["color_mlp"], feat, "sigmoid")


def query(params: Dict[str, Any], sc: SceneConfig,
          p_nor: jnp.ndarray) -> jnp.ndarray:
    """Joint query -> (N, 4) [r, g, b, sdf]. Mirrors decoders.forward.

    In brick mode the shared features are encoded ONCE and feed both heads
    (one gather serves SDF and RGB — half the reference's memory traffic).
    """
    if sc.encoding == "brick":
        feat = brick_encoding.encode(params["table"], p_nor, sc.brick_spec)
        sdf = decoders.mlp_apply(params["sdf_mlp"], feat, "tanh")[..., 0]
        rgb = decoders.mlp_apply(params["color_mlp"], feat, "sigmoid")
        return jnp.concatenate([rgb, sdf[..., None]], axis=-1)
    sdf = raw_sdf(params, sc, p_nor)
    rgb = raw_rgb(params, sc, p_nor)
    return jnp.concatenate([rgb, sdf[..., None]], axis=-1)


def _fine_groups(fine: tuple, sel_onehot: jnp.ndarray, n_mid: int) -> list:
    """Fine-level band groups: [(levels, sel_onehot_slice), ...].

    `n_mid` (static, 0 = off): the non-finest fine levels get only the
    `n_mid` NEAREST selected samples instead of all K. sel_onehot rows come
    from top_k so they are ordered nearest-surface-first; slicing the first
    n_mid rows is exact. TPU rationale (round-3 trace): the fine-level
    backward scatter costs ~20 ns/row and dominates the mapping step
    (2.03 ms/iter of 7.16); a mid level's bricks are ~6x coarser than the
    sample spacing, so K=12 band samples mostly re-read the same 1-2 rows —
    a narrower mid band cuts static scatter rows ~proportionally while
    training the same zero-crossing content."""
    if n_mid and len(fine) > 1 and 0 < n_mid < sel_onehot.shape[1]:
        return [(fine[:-1], sel_onehot[:, :n_mid]), (fine[-1:], sel_onehot)]
    return [(fine, sel_onehot)]


def _lod_decode(params, sc, p_nor, feat_c, groups, group_feats):
    """Re-spread each band group's features to all S samples, concat with
    the coarse features (level-major order), decode both heads."""
    R, S = p_nor.shape[:2]
    feats = [feat_c]
    for (g_levels, g_sel), feat_f_sel in zip(groups, group_feats):
        K = g_sel.shape[1]
        sel = g_sel.astype(p_nor.dtype)
        feats.append(jnp.einsum("rks,rkf->rsf", sel,
                                feat_f_sel.reshape(R, K, -1)))
    feat = jnp.concatenate(feats, axis=-1).reshape(R * S, -1)
    sdf = decoders.mlp_apply(params["sdf_mlp"], feat, "tanh")[..., 0]
    rgb = decoders.mlp_apply(params["color_mlp"], feat, "sigmoid")
    return jnp.concatenate([rgb, sdf[..., None]], axis=-1).reshape(R, S, 4)


def _group_points(p_nor: jnp.ndarray, groups) -> list:
    """Selected band points per group, (R*K_g, 3) each."""
    pts = []
    for g_levels, g_sel in groups:
        sel = g_sel.astype(p_nor.dtype)
        pts.append(jnp.einsum("rks,rsc->rkc", sel, p_nor).reshape(-1, 3))
    return pts


def _zsort_sel(sel: jnp.ndarray) -> jnp.ndarray:
    """Reorder a one-hot selection (R, K, S) so the K rows are in ascending
    sample order (z order, z_vals being sorted). Every consumer sums over
    K, so the reorder is numerics-neutral; it makes same-brick band samples
    CONSECUTIVE, which the backward's row dedup requires.

    The sorted one-hot is REBUILT by comparison rather than permuted with
    take_along_axis: the latter is a row-granular gather of R*K rows
    (~20 ns/row on TPU) for what is otherwise pure vector work."""
    pos = jnp.argmax(sel, axis=-1)                        # (R, K)
    pos_sorted = jnp.sort(pos, axis=-1)
    S = sel.shape[-1]
    return pos_sorted[..., None] == jnp.arange(S, dtype=pos.dtype)[None,
                                                                   None, :]


def _dedup_groups(groups, R: int, frac: float):
    """z-sort each band group + build encode_multi dedup specs: at most
    ceil(K * frac) scatter rows per ray per group (>= 2)."""
    import math
    groups = [(lv, _zsort_sel(sel)) for lv, sel in groups]
    spec = [(R, sel.shape[1],
             min(sel.shape[1], max(2, math.ceil(sel.shape[1] * frac))))
            for _, sel in groups]
    return groups, spec


def _lod_fine_tail(params: Dict[str, Any], sc: SceneConfig,
                   p_nor: jnp.ndarray, feat_c: jnp.ndarray,
                   sel_onehot: jnp.ndarray, fine: tuple,
                   n_mid: int = 0, dedup: float = 0.0) -> jnp.ndarray:
    """Shared tail of the LOD queries: encode the fine levels at the
    selected samples (one encode_multi across band groups), re-spread,
    concat with the coarse features, decode.
    p_nor: (R, S, 3); feat_c: (R, S, Cc); sel_onehot: (R, K, S).
    `dedup` > 0 enables the backward scatter-row dedup (see encode_multi):
    each band group's table-gradient rows are run-length-merged to at most
    ceil(K * dedup) rows per ray."""
    spec = sc.brick_spec
    groups = _fine_groups(fine, sel_onehot, n_mid)
    if dedup > 0:
        groups, dd = _dedup_groups(groups, p_nor.shape[0], dedup)
    else:
        dd = None
    feats = brick_encoding.encode_multi(
        params["table"], _group_points(p_nor, groups), spec,
        [g for g, _ in groups], dedup=dd)
    return _lod_decode(params, sc, p_nor, feat_c, groups, feats)


def query_lod_field(params: Dict[str, Any], sc: SceneConfig,
                    p_nor: jnp.ndarray, K: int,
                    split: str = "cost", n_mid: int = 0,
                    dedup: float = 0.0) -> jnp.ndarray:
    """Surface-LOD joint query with FIELD-guided sample selection (brick
    mode): the K samples per ray that get fine detail are those where the
    coarse-only SDF is nearest zero — i.e. where the coarse field says the
    surface is — instead of where the sensor depth says it is.

    Why this exists (BENCHLOG round 3): depth-band query gating in TRACKING
    reads the field relative to the *hypothesized* pose, so a pose error
    shifts the gate off the band mapping actually trained; the resulting
    gradient bias compounded to 11 cm ATE on the room0-scale drive. The
    coarse field is pose-independent in world space and band-gated mapping
    trains fine content exactly around its zero crossing, so gating by
    |sdf_coarse| reads the trained band faithfully at any hypothesis (and
    skips the off-band collision noise a full query would read).

    p_nor: (R, S, 3). Returns (R, S, 4) [r, g, b, sdf]."""
    assert sc.encoding == "brick"
    spec = sc.brick_spec
    R, S = p_nor.shape[:2]
    coarse, fine = brick_encoding.coarse_fine_split(spec, split)
    assert not coarse or not fine or max(coarse) < min(fine)

    feat_c = brick_encoding.encode(
        params["table"], p_nor.reshape(-1, 3), spec, coarse)   # (RS, Cc)
    # selection probe: coarse-only SDF (zero-filled fine), gradient-stopped
    # — the selection is a discrete argmax; differentiating the probe would
    # only add a dead backward pass
    probe_feat = _zero_fill_levels(jax.lax.stop_gradient(feat_c), spec,
                                   tuple(coarse))
    sdf_c = decoders.mlp_apply(params["sdf_mlp"], probe_feat,
                               "tanh")[..., 0].reshape(R, S)
    score = -jnp.abs(jax.lax.stop_gradient(sdf_c))
    _, sel_idx = jax.lax.top_k(score, K)                      # (R, K)
    sel_onehot = (sel_idx[..., None] == jnp.arange(S)[None, None, :])
    return _lod_fine_tail(params, sc, p_nor, feat_c.reshape(R, S, -1),
                          sel_onehot, fine, n_mid, dedup)


def query_lod(params: Dict[str, Any], sc: SceneConfig, p_nor: jnp.ndarray,
              sel_onehot: jnp.ndarray, split: str = "cost",
              n_mid: int = 0, dedup: float = 0.0) -> jnp.ndarray:
    """Surface-LOD joint query (brick mode): coarse (dense/matmul) levels on
    ALL samples, hashed fine levels only on a per-ray selected subset.

    p_nor: (R, S, 3) normalized points; sel_onehot: (R, K, S) one-hot rows
    marking the K samples per ray that get fine detail. Returns (R, S, 4)
    [r, g, b, sdf].

    TPU rationale (BENCHLOG.md): hashed-level gather/scatter cost is
    per-row-count-bound (~9/44 ns per row), so cutting fine-level queries
    from S=40 to K~16 samples/ray removes most of it. Selection and
    re-spreading are per-ray one-hot matmuls whose VJPs are transposed
    matmuls — MXU work, no new gathers/scatters. Fine detail only matters
    within the truncation band around surfaces, which is exactly what the
    selection targets; elsewhere the SDF is driven by free-space/tail losses
    that coarse levels represent fine.
    """
    assert sc.encoding == "brick"
    spec = sc.brick_spec
    R, S = p_nor.shape[:2]
    coarse, fine = brick_encoding.coarse_fine_split(spec, split)
    # level-major feature order: coarse must be a ladder prefix so that
    # concat([coarse_feat, fine_feat]) matches the full encode's layout.
    assert not coarse or not fine or max(coarse) < min(fine)

    # ONE encode_multi for all point sets (all samples x coarse, band
    # groups x fine): each independent encode() would force a full-table
    # cotangent that autodiff assembles and adds separately (~0.7 ms/iter
    # at mapping scale, round-3 trace); the fused VJP assembles one.
    groups = _fine_groups(fine, sel_onehot, n_mid)
    if dedup > 0:
        groups, dd = _dedup_groups(groups, R, dedup)
        dd = [None] + dd   # the all-samples coarse set is never deduped
    else:
        dd = None
    feats = brick_encoding.encode_multi(
        params["table"],
        [p_nor.reshape(-1, 3)] + _group_points(p_nor, groups), spec,
        [coarse] + [g for g, _ in groups], dedup=dd)
    feat_c = feats[0].reshape(R, S, -1)
    return _lod_decode(params, sc, p_nor, feat_c, groups, feats[1:])


def query_coarse(params: Dict[str, Any], sc: SceneConfig,
                 p_nor: jnp.ndarray, split: str = "cost") -> jnp.ndarray:
    """Coarse-levels-only joint query (brick mode) -> (N, 4) [r, g, b, sdf].

    The hashed fine levels are skipped entirely and their feature columns
    zero-filled, so the decoders see the map low-pass filtered at the
    coarse ladder's resolution. Used for coarse-to-fine camera tracking:
    the fine levels' spatially-hashed content is only trained inside the
    mapped surface band, so a wrong pose hypothesis reads collision noise
    exactly where the tracking loss is most sensitive; the coarse field is
    dense, trained everywhere, and gives a wide smooth basin for the pose
    gradient (RenderConfig.n_fine = -1)."""
    assert sc.encoding == "brick"
    spec = sc.brick_spec
    coarse, _ = brick_encoding.coarse_fine_split(spec, split)
    feat = brick_encoding.encode(params["table"], p_nor, spec, coarse)
    feat = _zero_fill_levels(feat, spec, tuple(coarse))
    sdf = decoders.mlp_apply(params["sdf_mlp"], feat, "tanh")[..., 0]
    rgb = decoders.mlp_apply(params["color_mlp"], feat, "sigmoid")
    return jnp.concatenate([rgb, sdf[..., None]], axis=-1)


def beta_value(params: Dict[str, Any], sc: SceneConfig) -> jnp.ndarray:
    return params["beta"][0] if sc.learnable_beta else jnp.float32(sc.beta_init)
