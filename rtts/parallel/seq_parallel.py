"""Sequence-parallel self-attention over a mesh axis (SURVEY.md §3.4 /
§6.7 optional extension: "shard the sequence axis with shard_map,
all-gather buckets per hash round").  Covers BOTH stack kinds: LSH
(bucketed, below) and full softmax (``full_self_attention_seq_parallel``
— q shards vs all-gathered keys through the flash kernel's q_offset).

The reference scales sequence length algorithmically on one device; this
module adds the distributed option for sequences beyond one chip's compute:
the sequence axis is sharded, each device hashes its local positions,
bucket ids are all-gathered (cheap: int32), every device derives the SAME
global sorted order, attends its 1/n slice of the sorted chunks, and
outputs return to sequence order for the unsort + multi-round combine.

Two exchange strategies for the (qk, v) operands and the (out, lse)
results:

- ``exchange="allgather"``: one all-gather in, one out — O(L·d) transient
  HBM per device, minimal latency; the right default when L·d fits.
- ``exchange="ring"``: n-1 ``ppermute`` neighbor hops; each device keeps
  only its own shard plus one in-flight shard buffer, selecting the rows
  its sorted slice needs as each shard streams past.  Peak transient HBM
  drops to O(L/n · d) at the same total traffic — for sequences whose
  gathered (qk, v) would not fit.

Numerical contract: identical output to the single-device
``lsh_attention_core`` (tested on the virtual 8-device mesh, both
exchanges) because the permutation, masks, and combine are identical —
only the chunk loop is split across devices.

``lsh_self_attention_seq_parallel`` is the drop-in sublayer wrapper used
by the model stack when ``ReformerStackConfig.seq_parallel_axis`` is set.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rtts.attention.full import _len_norm, _merge_heads, _split_heads
from rtts.attention.lsh import (
    _sort_by_bucket,
    hash_vectors,
)
from rtts.config import AttentionConfig
from rtts.nn.layers import dense


def _ring_gather(x_l: jnp.ndarray, pos: jnp.ndarray, rank, n_dev: int,
                 shard: int, axis: str) -> jnp.ndarray:
    """Gather rows of a sequence-sharded array at arbitrary global indices.

    x_l: (B, H, shard, d) — this device's shard of a (B, H, n*shard, d)
    array.  pos: (B, H, P) global row indices needed locally.  The shards
    ride a ring (n-1 ppermute hops); each device copies out the rows whose
    global index falls in the shard currently held.  Returns (B, H, P, d).
    """
    acc = jnp.zeros(pos.shape + (x_l.shape[-1],), x_l.dtype)
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def body(i, carry):
        acc, buf = carry
        src_rank = (rank - i) % n_dev  # whose shard buf holds after i hops
        local = pos - src_rank * shard
        ok = (local >= 0) & (local < shard)
        got = jnp.take_along_axis(
            buf, jnp.clip(local, 0, shard - 1)[..., None], axis=2)
        acc = jnp.where(ok[..., None], got, acc)
        buf = jax.lax.ppermute(buf, axis, perm)
        return acc, buf

    acc, _ = jax.lax.fori_loop(0, n_dev, body, (acc, x_l))
    return acc


def lsh_attention_seq_parallel(
    qk: jnp.ndarray,        # (B, H, L, d) sharded over L on `axis`
    v: jnp.ndarray,
    cfg: AttentionConfig,
    mask: Optional[jnp.ndarray],   # (B, L) bool, sharded over L
    causal: bool,
    rotations: jnp.ndarray,        # (H, d, nh, nb/2) replicated
    mesh: Mesh,
    axis: str = "model",
    exchange: str = "allgather",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sequence-parallel LSH self-attention. Returns (B, H, L, d) sharded
    like qk.  Rotations must be passed explicitly (all devices must hash
    identically).  ``dropout_rate``/``dropout_rng`` apply the position-keyed
    attention-probs dropout — identical mask to the single-device
    ``lsh_attention_core`` from the same rng (see ``positional_dropout``)."""
    if exchange not in ("allgather", "ring"):
        raise ValueError(f"unknown exchange {exchange!r}")
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

    drop_active = dropout_rng is not None and dropout_rate > 0.0

    def local_fn(qk_l, v_l, mask_l, drop_seed):
        # qk_l: (B, H, L/n, d) local shard
        rank = jax.lax.axis_index(axis)
        shard = l // n_dev
        # hash local positions (same rotations everywhere)
        buckets_l = hash_vectors(qk_l, nb, nh, jax.random.PRNGKey(0),
                                 mask_l, rotations=rotations)
        # bucket ids are small ints — always all-gathered (every device
        # must derive the identical global sorted order)
        buckets = jax.lax.all_gather(buckets_l, axis, axis=3, tiled=True)
        mask_g = (jax.lax.all_gather(mask_l, axis, axis=1, tiled=True)
                  if mask_l is not None else None)

        sorted_pos, undo_idx, sorted_buckets = _sort_by_bucket(buckets)

        nc = nh * l // c
        nc_local = nc // n_dev
        lo = rank * nc_local
        before, after = cfg.num_chunks_before, cfg.num_chunks_after
        pos_c = sorted_pos.reshape(b, h, nc, c)

        def slice_with_neighbors(x):
            idx = (lo + jnp.arange(-before, nc_local + after)) % nc
            return jnp.take(x, idx, axis=2)

        pos_k_my = slice_with_neighbors(pos_c)     # (B,H,ncl+b+a,c)
        pos_q_my = jax.lax.dynamic_slice_in_dim(pos_c, lo, nc_local, axis=2)

        if exchange == "allgather":
            qk_g = jax.lax.all_gather(qk_l, axis, axis=2, tiled=True)
            v_g = jax.lax.all_gather(v_l, axis, axis=2, tiled=True)

            def round_gather(x):
                xb = jnp.broadcast_to(x[:, :, None], (b, h, nh, l, d))
                return jnp.take_along_axis(xb, sorted_pos[..., None], axis=3)

            qk_s = round_gather(qk_g)
            v_s = round_gather(v_g)
            q_c = qk_s.reshape(b, h, nc, c, d)
            k_c = (_len_norm(qk_s) * (d ** -0.5)).reshape(b, h, nc, c, d)
            v_c = v_s.reshape(b, h, nc, c, d)
            q_my = jax.lax.dynamic_slice_in_dim(q_c, lo, nc_local, axis=2)
            k_my = slice_with_neighbors(k_c)
            v_my = slice_with_neighbors(v_c)
        else:
            # ring: fetch only the rows this device's sorted slice needs
            wk = pos_k_my.shape[2]
            flat_k = pos_k_my.reshape(b, h, wk * c)
            qk_need = _ring_gather(qk_l, flat_k, rank, n_dev, shard, axis)
            v_need = _ring_gather(v_l, flat_k, rank, n_dev, shard, axis)
            k_my = (_len_norm(qk_need) * (d ** -0.5)).reshape(
                b, h, wk, c, d)
            v_my = v_need.reshape(b, h, wk, c, d)
            # queries: the subset of flat_k rows that are my own chunks
            q_my = qk_need.reshape(b, h, wk, c, d)[:, :, before:before + nc_local]

        if mask_g is not None:
            # validity falls out of the sort: hash_vectors forced padding
            # into the overflow bucket, so sorted_buckets < nb_total IS the
            # gathered mask (replaces a transaction-bound width-1 gather —
            # same trick as lsh_attention_core)
            from rtts.attention.lsh import total_buckets

            val_c = (sorted_buckets < total_buckets(nb)).reshape(
                b, h, nc, c)
            val_k_my = slice_with_neighbors(val_c)
        else:
            val_k_my = jnp.ones(pos_k_my.shape, bool)

        out_c, lse_c = _attend_window(
            q_my, k_my, v_my, pos_q_my, pos_k_my, val_k_my, causal,
            before, after, cfg.mask_value, cfg.self_mask_value,
            dropout_rate=dropout_rate,
            dropout_seed=drop_seed if drop_active else None,
            chunk_lo=lo, chunks_per_round=l // c)
        # out_c: (B,H,ncl,c,d) for sorted slots [lo*c, (lo+ncl)*c)

        # return to sequence order: my sequence shard needs, per round, the
        # sorted-slot outputs at undo_idx of my positions.  undo_idx is a
        # within-round index in [0, L); the flat sorted-slot axis is
        # round-major, so the global slot is round * L + undo.
        undo_my = jax.lax.dynamic_slice_in_dim(
            undo_idx, rank * shard, shard, axis=3)          # (B,H,nh,shard)
        out_flat = out_c.reshape(b, h, nc_local * c, d)
        lse_flat = lse_c.reshape(b, h, nc_local * c)
        if exchange == "allgather":
            out_all = jax.lax.all_gather(out_flat, axis, axis=2, tiled=True)
            lse_all = jax.lax.all_gather(lse_flat, axis, axis=2, tiled=True)
            out_r = jnp.take_along_axis(
                out_all.reshape(b, h, nh, l, d), undo_my[..., None], axis=3)
            lse_r = jnp.take_along_axis(
                lse_all.reshape(b, h, nh, l), undo_my, axis=3)
        else:
            offs = (jnp.arange(nh, dtype=undo_my.dtype) * l)[None, None, :,
                                                             None]
            flat_u = (undo_my + offs).reshape(b, h, nh * shard)
            # ride f32 so the lse column keeps combine-exact precision
            got = _ring_gather(
                jnp.concatenate(
                    [out_flat.astype(jnp.float32), lse_flat[..., None]],
                    axis=-1),
                flat_u, rank, n_dev, nc_local * c, axis)
            out_r = got[..., :d].reshape(b, h, nh, shard, d).astype(
                out_flat.dtype)
            lse_r = got[..., d].reshape(b, h, nh, shard)

        if nh == 1:
            return out_r[:, :, 0]
        w = jnp.exp(lse_r - jax.nn.logsumexp(lse_r, axis=2, keepdims=True))
        return jnp.einsum("bhnl,bhnld->bhld", w.astype(out_r.dtype), out_r)

    if mask is None:
        mask = jnp.ones((b, l), bool)
    if drop_active:
        from rtts.ops.flash_attention import dropout_seed_from_key

        seed = dropout_seed_from_key(dropout_rng)
    else:
        seed = jnp.zeros((), jnp.uint32)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, axis), P()),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(qk, v, mask, seed)


def full_self_attention_seq_parallel(
    params,
    x: jnp.ndarray,               # (B, L, D)
    mask: Optional[jnp.ndarray],  # (B, L) bool
    causal: bool,
    cfg: AttentionConfig,
    compute_dtype=None,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sequence-parallel shared-QK FULL attention: drop-in for
    ``shared_qk_self_attention`` when the stack's ``seq_parallel_axis`` is
    set and the resolved kind is "full" (SURVEY.md §3.4 applied to the
    full-softmax path the flash kernel made competitive at long lengths —
    BENCH.md r3 "Flash attention").

    Queries stay sharded over ``axis``; keys/values are all-gathered
    (O(L*d) — cheap next to the O(L^2/n) scores each device computes).
    Each device attends its L/n query shard against the global keys with
    its ``rank * shard`` position offset, so causal/self masking is
    identical to the single-device sublayer: with the flash kernel the
    q-block decomposition is the same one the single-device call uses,
    making outputs bit-identical, and the naive fallback matches to f32
    reduction tolerance.  Attention FLOPs and the O(shard * L) score
    transient both split n ways.

    ``dropout_rate``/``dropout_rng`` apply attention-probs dropout.  The
    counter-hash mask keys on GLOBAL (q_offset + row, col), so each shard
    regenerates exactly the mask the single-device FLASH sublayer draws
    from the same rng — flash-vs-flash stays bit-identical at p > 0.  The
    naive fallback here uses the same counter-hash draw (not the
    single-device naive path's bernoulli sample — a different, equally
    valid sample), keeping the mask sharding-invariant."""
    if mesh is None:
        from rtts.parallel.mesh import current_mesh

        mesh = current_mesh()
    if mesh is None or axis not in mesh.shape:
        raise ValueError(
            f"seq-parallel attention needs a Mesh with axis {axis!r}; "
            f"enter one (`with mesh:`) or pass mesh= explicitly")
    n_dev = mesh.shape[axis]
    b, l, _ = x.shape
    if l % n_dev:
        raise ValueError(f"sequence length {l} must divide over {n_dev} "
                         f"devices on axis {axis!r}")
    from rtts.ops.flash_attention import resolve_flash_impl

    impl = resolve_flash_impl(cfg.flash, l // n_dev, l)
    qk = _split_heads(dense(params["w_qk"], x, compute_dtype), cfg.num_heads)
    v = _split_heads(dense(params["w_v"], x, compute_dtype), cfg.num_heads)
    d = qk.shape[-1]
    shard = l // n_dev

    drop_active = dropout_rng is not None and dropout_rate > 0.0

    def local_fn(qk_l, v_l, mask_l, drop_seed):
        rank = jax.lax.axis_index(axis)
        # per-row ops commute with the shard: normalize locally, gather once
        k_g = jax.lax.all_gather(_len_norm(qk_l) * (d ** -0.5), axis,
                                 axis=2, tiled=True)
        v_g = jax.lax.all_gather(v_l, axis, axis=2, tiled=True)
        mask_g = jax.lax.all_gather(mask_l, axis, axis=1, tiled=True)
        q_off = rank * shard
        if impl == "flash":
            from rtts.ops.flash_attention import flash_attend

            return flash_attend(qk_l, k_g, v_g, kv_mask=mask_g,
                                causal=causal, self_mask=True, sm_scale=1.0,
                                q_offset=q_off,
                                dropout_rate=(dropout_rate if drop_active
                                              else 0.0),
                                dropout_seed=(drop_seed if drop_active
                                              else None))
        from rtts.attention.full import shared_qk_scores_mask

        scores = jnp.einsum("bhqd,bhkd->bhqk", qk_l, k_g).astype(jnp.float32)
        q_pos = q_off + jnp.arange(shard)
        k_pos = jnp.arange(l)
        scores = shared_qk_scores_mask(
            scores, q_pos[None, None, :], k_pos[None, None, :],
            mask_g[:, None, :], causal)
        probs = jax.nn.softmax(scores, axis=-1)
        if drop_active:
            from rtts.ops.flash_attention import dropout_keep_mask

            bh = qk_l.shape[0] * qk_l.shape[1]
            keep = dropout_keep_mask(drop_seed, bh, shard, l, dropout_rate,
                                     q_offset=q_off)
            probs = probs * (keep.reshape(probs.shape).astype(probs.dtype)
                             / (1.0 - dropout_rate))
        return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v_g.dtype), v_g)

    if mask is None:
        mask = jnp.ones((b, l), bool)
    if drop_active:
        from rtts.ops.flash_attention import dropout_seed_from_key

        seed = dropout_seed_from_key(dropout_rng)
    else:
        seed = jnp.zeros((), jnp.uint32)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, axis), P()),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    out = fn(qk, v, mask, seed)
    return dense(params["w_o"], _merge_heads(out), compute_dtype)


def lsh_self_attention_seq_parallel(
    params,
    x: jnp.ndarray,               # (B, L, D)
    mask: Optional[jnp.ndarray],  # (B, L) bool
    causal: bool,
    cfg: AttentionConfig,
    rng: Optional[jax.Array],
    compute_dtype=None,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
    exchange: str = "allgather",
    deterministic: bool = True,
) -> jnp.ndarray:
    """Sequence-parallel drop-in for ``lsh_self_attention`` (same hash
    draw -> same output as the single-device sublayer).  Requires an
    active or explicit Mesh; the sequence axis is shard_map'd over
    ``axis``.  ``deterministic=False`` with ``cfg.attention_dropout > 0``
    applies the position-keyed attention-probs dropout — the drop key
    derives from the CALLER rng exactly like the single-device sublayer
    (before any hash_seed override), so outputs match it at p > 0 too."""
    if mesh is None:
        from rtts.parallel.mesh import current_mesh

        mesh = current_mesh()
    if mesh is None or axis not in mesh.shape:
        raise ValueError(
            f"seq-parallel attention needs a Mesh with axis {axis!r}; "
            f"enter one (`with mesh:`) or pass mesh= explicitly")
    drop_rng = (jax.random.fold_in(rng, 7)
                if (rng is not None and not deterministic
                    and cfg.attention_dropout > 0.0)
                else None)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if cfg.hash_seed is not None:
        rng = jax.random.PRNGKey(cfg.hash_seed)
    l = x.shape[1]
    nb = cfg.num_buckets or 0
    if nb == 0:
        from rtts.attention.lsh import auto_num_buckets

        nb = auto_num_buckets(l, cfg.chunk_length)
    # identical rotation draw to hash_vectors' internal one => identical
    # buckets => identical output to the single-device path (factorized
    # specs draw sum(factors)/2 rotation columns, like hash_vectors)
    factors = [nb] if isinstance(nb, int) else list(nb)
    rot_size = sum(factors)
    rotations = jax.random.normal(
        rng, (cfg.num_heads, cfg.head_dim, cfg.num_hashes, rot_size // 2),
        dtype=jnp.float32)
    qk = _split_heads(dense(params["w_qk"], x, compute_dtype), cfg.num_heads)
    v = _split_heads(dense(params["w_v"], x, compute_dtype), cfg.num_heads)
    out = lsh_attention_seq_parallel(qk, v, cfg, mask, causal, rotations,
                                     mesh, axis=axis, exchange=exchange,
                                     dropout_rate=cfg.attention_dropout,
                                     dropout_rng=drop_rng)
    return dense(params["w_o"], _merge_heads(out), compute_dtype)


def _attend_window(q_my, k_pad, v_pad, pos_q, pos_k_pad, val_pad, causal,
                   before, after, mask_value, self_mask_value,
                   dropout_rate=0.0, dropout_seed=None, chunk_lo=None,
                   chunks_per_round=None):
    """Attend my chunks against their neighbor windows.

    q_my: (B,H,ncl,c,d); k_pad etc: (B,H,ncl+before+after,c,d) — chunk i of
    q_my attends chunks [i, i+before+after] of the padded arrays (which are
    [i-before, ..., i, ..., i+after] in global chunk coordinates).

    ``dropout_rate``/``dropout_seed`` (uint32 scalar) apply the
    position-keyed attention-probs dropout of ``lsh_attend_chunks``: the
    counter-hash keys on GLOBAL chunk index (``chunk_lo + i``, traced rank
    offset) and original positions, so every device regenerates exactly the
    single-device mask."""
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
    if dropout_seed is not None and dropout_rate > 0.0:
        from rtts.attention.lsh import dropout_lane, positional_dropout

        lane = dropout_lane(b, h, chunk_lo + jnp.arange(ncl),
                            chunks_per_round)
        probs = positional_dropout(probs, pos_q, pk, lane, dropout_seed,
                                   dropout_rate)
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", probs.astype(vs.dtype), vs)
    return out, lse
