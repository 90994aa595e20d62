"""Sequence-parallel LSH attention over a mesh axis (SURVEY.md §3.4 /
§6.7 optional extension: "shard the sequence axis with shard_map,
all-gather buckets per hash round").

The reference scales sequence length algorithmically on one device; this
module adds the distributed option for sequences beyond one chip's compute:
the sequence axis is sharded, each device hashes its local positions,
bucket ids are all-gathered (cheap: int32), every device derives the SAME
global sorted order, attends its 1/n slice of the sorted chunks, and
outputs are all-gathered for the unsort + multi-round combine.

v1 communication profile: one all-gather of (qk, v) in and one of
(out, lse) — O(L·d) over ICI, the standard naive-SP attention cost; compute
per device is 1/n of the chunk-attend FLOPs.  A ring exchange that only
moves neighbor chunks is the documented next step if L·d ever exceeds
transient HBM.

Numerical contract: identical output to the single-device
``lsh_attention_core`` (tested on the virtual 8-device mesh) because the
permutation, masks, and combine are identical — only the chunk loop is
split across devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rtts.attention.full import _len_norm
from rtts.attention.lsh import (
    _sort_by_bucket,
    hash_vectors,
    lsh_attend_chunks,
)
from rtts.config import AttentionConfig


def lsh_attention_seq_parallel(
    qk: jnp.ndarray,        # (B, H, L, d) sharded over L on `axis`
    v: jnp.ndarray,
    cfg: AttentionConfig,
    mask: Optional[jnp.ndarray],   # (B, L) bool, sharded over L
    causal: bool,
    rotations: jnp.ndarray,        # (H, d, nh, nb/2) replicated
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Sequence-parallel LSH self-attention. Returns (B, H, L, d) sharded
    like qk.  Rotations must be passed explicitly (all devices must hash
    identically)."""
    n_dev = mesh.shape[axis]
    b, h, l, d = qk.shape
    c = cfg.chunk_length
    nh = cfg.num_hashes
    nb = cfg.num_buckets or 0
    if nb == 0:
        from rtts.attention.lsh import auto_num_buckets

        nb = auto_num_buckets(l, c)
    if (nh * l) % (c * n_dev) != 0:
        raise ValueError(
            f"nh*L ({nh * l}) must divide into chunks of {c} across "
            f"{n_dev} devices")

    def local_fn(qk_l, v_l, mask_l):
        # qk_l: (B, H, L/n, d) local shard
        rank = jax.lax.axis_index(axis)
        # hash local positions (same rotations everywhere)
        buckets_l = hash_vectors(qk_l, nb, nh, jax.random.PRNGKey(0),
                                 mask_l, rotations=rotations)
        # gather the small stuff and the operands
        buckets = jax.lax.all_gather(buckets_l, axis, axis=3, tiled=True)
        qk_g = jax.lax.all_gather(qk_l, axis, axis=2, tiled=True)
        v_g = jax.lax.all_gather(v_l, axis, axis=2, tiled=True)
        mask_g = (jax.lax.all_gather(mask_l, axis, axis=1, tiled=True)
                  if mask_l is not None else None)

        sorted_pos, undo_idx = _sort_by_bucket(buckets)      # (B,H,nh,L)

        def round_gather(x):
            xb = jnp.broadcast_to(x[:, :, None], (b, h, nh, l, d))
            return jnp.take_along_axis(xb, sorted_pos[..., None], axis=3)

        qk_s = round_gather(qk_g)
        v_s = round_gather(v_g)
        if mask_g is not None:
            mb = jnp.broadcast_to(mask_g[:, None, None, :], (b, h, nh, l))
            valid_s = jnp.take_along_axis(mb, sorted_pos, axis=3)
        else:
            valid_s = jnp.ones((b, h, nh, l), bool)

        nc = nh * l // c
        nc_local = nc // n_dev
        q_c = qk_s.reshape(b, h, nc, c, d)
        k_c = (_len_norm(qk_s) * (d ** -0.5)).reshape(b, h, nc, c, d)
        v_c = v_s.reshape(b, h, nc, c, d)
        pos_c = sorted_pos.reshape(b, h, nc, c)
        val_c = valid_s.reshape(b, h, nc, c)

        # my slice of sorted chunks, plus wrapped neighbor chunks
        before, after = cfg.num_chunks_before, cfg.num_chunks_after
        lo = rank * nc_local

        def slice_with_neighbors(x):
            idx = (lo + jnp.arange(-before, nc_local + after)) % nc
            return jnp.take(x, idx, axis=2)

        q_my = jax.lax.dynamic_slice_in_dim(q_c, lo, nc_local, axis=2)
        k_my = slice_with_neighbors(k_c)
        v_my = slice_with_neighbors(v_c)
        pos_k_my = slice_with_neighbors(pos_c)
        val_my = slice_with_neighbors(val_c)
        pos_q_my = jax.lax.dynamic_slice_in_dim(pos_c, lo, nc_local, axis=2)

        # attend: local chunks against [neighbors | own | neighbors] window.
        # Reuse the chunk kernel by reshaping: for each of my chunks i, the
        # key window is chunks [i, i+before+after] of the padded slice.
        out_c, lse_c = _attend_window(
            q_my, k_my, v_my, pos_q_my, pos_k_my, val_my, causal,
            before, after, cfg.mask_value, cfg.self_mask_value)

        # gather every device's chunk outputs, then unsort + combine locally
        out_all = jax.lax.all_gather(out_c, axis, axis=2, tiled=True)
        lse_all = jax.lax.all_gather(lse_c, axis, axis=2, tiled=True)
        out_flat = out_all.reshape(b, h, nh, l, d)
        lse_flat = lse_all.reshape(b, h, nh, l)
        out_r = jnp.take_along_axis(out_flat, undo_idx[..., None], axis=3)
        lse_r = jnp.take_along_axis(lse_flat, undo_idx, axis=3)
        if nh == 1:
            out = out_r[:, :, 0]
        else:
            w = jnp.exp(lse_r - jax.nn.logsumexp(lse_r, axis=2, keepdims=True))
            out = jnp.einsum("bhnl,bhnld->bhld", w.astype(out_r.dtype), out_r)
        # return my sequence shard
        shard = l // n_dev
        return jax.lax.dynamic_slice_in_dim(out, rank * shard, shard, axis=2)

    if mask is None:
        mask = jnp.ones((b, l), bool)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, axis)),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(qk, v, mask)


def _attend_window(q_my, k_pad, v_pad, pos_q, pos_k_pad, val_pad, causal,
                   before, after, mask_value, self_mask_value):
    """Attend my chunks against their neighbor windows.

    q_my: (B,H,ncl,c,d); k_pad etc: (B,H,ncl+before+after,c,d) — chunk i of
    q_my attends chunks [i, i+before+after] of the padded arrays (which are
    [i-before, ..., i, ..., i+after] in global chunk coordinates)."""
    b, h, ncl, c, d = q_my.shape
    w = before + after + 1
    # build the key windows by stacking shifted slices (static shifts)
    ks = jnp.concatenate([k_pad[:, :, i:i + ncl] for i in range(w)], axis=-2)
    vs = jnp.concatenate([v_pad[:, :, i:i + ncl] for i in range(w)], axis=-2)
    pk = jnp.concatenate([pos_k_pad[:, :, i:i + ncl] for i in range(w)],
                         axis=-1)
    vl = jnp.concatenate([val_pad[:, :, i:i + ncl] for i in range(w)],
                         axis=-1)

    scores = jnp.einsum("bhnqd,bhnkd->bhnqk", q_my, ks).astype(jnp.float32)
    scores = jnp.where(vl[..., None, :], scores, mask_value)
    if causal:
        scores = jnp.where(pos_q[..., :, None] >= pk[..., None, :],
                           scores, mask_value)
    scores = jnp.where(pos_q[..., :, None] == pk[..., None, :],
                       self_mask_value, scores)
    lse = jax.nn.logsumexp(scores, axis=-1)
    probs = jnp.exp(scores - lse[..., None])
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", probs.astype(vs.dtype), vs)
    return out, lse
