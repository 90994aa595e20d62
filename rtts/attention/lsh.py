"""LSH-bucketed self-attention: hash -> stable sort -> chunked local attend
-> unsort -> multi-round combine (SURVEY.md §3.2, the verified build spec).

This is the readable jnp reference implementation (test oracle).  The fused
Pallas kernel in ``rtts/ops/lsh_attention.py`` implements the chunk-attend
stage; both share this module's hashing/sorting/masking semantics and are
cross-checked in tests.

Algorithm (parity contract, verified against the HF Reformer implementation
of the same algorithms the reference imports via reformer_pytorch):

- shared-QK: one projection supplies queries and keys; keys L2-normalized
  then scaled 1/sqrt(d).
- multi-round hashing: per-head random rotations (H, d, n_hashes, nb/2);
  bucket = argmax([xR; -xR]); hashing on stop_gradient'd vectors; optional
  fixed ``hash_seed`` for determinism; padding tokens forced into an extra
  bucket so they sort to the end; per-round offsets so rounds don't collide.
- num_buckets auto-set: 2 * L / chunk rounded up to a power of two.
- stable sort realized as argsort of (bucket * L + position) — unique keys,
  so order within a bucket is by original position.
- chunked attend: sorted q/k/v reshaped to chunks of ``chunk_length``;
  ``num_chunks_before/after`` neighbor chunks concatenated by roll.
- masking by ORIGINAL positions (pad -1e9, causal -1e9, self -1e5) so it
  survives the permutation.
- per-chunk logsumexp-stable softmax; rounds combined by softmax over each
  round's query logsumexp.
- unsort = gather by inverse permutation (TPU-friendly: no scatter).
- bucket cache: forward returns the buckets; the reversible backward passes
  them back in to skip re-hashing (bit-identical recompute).

Complexity: O(L * n_hashes * chunk * (1 + before + after)) vs O(L^2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtts.attention.full import (
    MASK_VALUE,
    SELF_MASK_VALUE,
    _len_norm,
    _merge_heads,
    _split_heads,
    shared_qk_self_attention,
)
from rtts.config import AttentionConfig
from rtts.nn.layers import dense


class LshCache(NamedTuple):
    buckets: jnp.ndarray  # (B, H, n_hashes, L) int32


def auto_num_buckets(seq_len: int, chunk_length: int) -> int:
    """2 * L / chunk rounded up to a power of two (reference auto rule)."""
    raw = max(2, 2 * seq_len // max(chunk_length, 1))
    return 1 << (raw - 1).bit_length()


def total_buckets(num_buckets) -> int:
    """Total bucket count for an int or factorized (list) spec."""
    if isinstance(num_buckets, int):
        return num_buckets
    out = 1
    for f in num_buckets:
        out *= f
    return out


def hash_vectors(
    vecs: jnp.ndarray,          # (B, H, L, d) — will be stop_gradient'd
    num_buckets,                 # int, or list of even factors (factorized)
    n_hashes: int,
    rng: jax.Array,
    mask: Optional[jnp.ndarray],  # (B, L) bool or None
    rotations: Optional[jnp.ndarray] = None,  # (H, d, nh, rot/2) override
) -> jnp.ndarray:
    """Random-rotation LSH -> buckets (B, H, n_hashes, L) in [0, nb] where
    bucket nb is the overflow bucket for padding tokens.

    Factorized mode (``num_buckets`` a list, reference semantics for very
    large bucket counts): one rotation block of size factor/2 per factor;
    per-factor argmax buckets combined mixed-radix
    (b = b0 + f0*b1 + f0*f1*b2 ...).

    ``rotations`` overrides the random draw — used by cross-framework
    parity tests to inject the oracle's rotation matrix."""
    b, h, l, d = vecs.shape
    factors = [num_buckets] if isinstance(num_buckets, int) else list(num_buckets)
    for f in factors:
        if f % 2 != 0:   # not assert: must survive python -O — an odd factor
            raise ValueError(f"bucket factors must be even, got {f}")
    rot_size = sum(factors)
    rot = rotations if rotations is not None else jax.random.normal(
        rng, (h, d, n_hashes, rot_size // 2), dtype=jnp.float32)
    x = jax.lax.stop_gradient(vecs).astype(jnp.float32)
    rotated = jnp.einsum("bhld,hdnr->bhnlr", x, rot)
    if len(factors) == 1:
        rotated = jnp.concatenate([rotated, -rotated], axis=-1)
        buckets = jnp.argmax(rotated, axis=-1).astype(jnp.int32)
    else:
        buckets, cur_sum, cur_product = None, 0, 1
        for f in factors:
            rf = rotated[..., cur_sum:cur_sum + f // 2]
            cur_sum += f // 2
            rf = jnp.concatenate([rf, -rf], axis=-1)
            piece = jnp.argmax(rf, axis=-1).astype(jnp.int32)
            buckets = piece if buckets is None else buckets + cur_product * piece
            cur_product *= f
    nb_total = total_buckets(num_buckets)
    if mask is not None:
        buckets = jnp.where(mask[:, None, None, :], buckets, nb_total)
    return buckets


def _sort_by_bucket(buckets: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """buckets (B,H,nh,L) -> (sorted_pos, undo_idx, sorted_buckets), all
    (B,H,nh,L).

    Per round: sort by the unique key ``bucket * L + position`` — this IS
    the stable sort (ties broken by original position, reference semantics).
    sorted_pos[..., s] = original position of sorted slot s; undo_idx is the
    inverse permutation (unsort is a gather by it — no scatter on TPU).

    ``sorted_buckets`` rides the SAME lax.sort (keys + iota payload — what
    argsort lowers to anyway, so this is free): slot s's bucket id.  Callers
    derive key validity from it (overflow bucket == padding, hash_vectors)
    instead of paying a separate width-1 mask gather — row gathers on this
    backend are transaction-bound, so a width-1 gather costs as much as the
    width-128 payload gather (BENCH.md r4 "gather fusion")."""
    l = buckets.shape[-1]
    pos = jnp.arange(l, dtype=jnp.int32)
    keys = buckets * l + pos[None, None, None, :]
    pos_b = jnp.broadcast_to(pos, keys.shape)
    sorted_keys, sorted_pos = jax.lax.sort((keys, pos_b), dimension=-1,
                                           num_keys=1)
    undo_idx = jnp.argsort(sorted_pos, axis=-1).astype(jnp.int32)
    return sorted_pos, undo_idx, sorted_keys // l


@jax.custom_vjp
def _perm_rows_take(x: jnp.ndarray, idx: jnp.ndarray,
                    inv: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of x (BH, L, W) into per-round sorted order:
    out[b, r*L + s] = x[b, idx[b, r, s]] — i.e. take_along_axis with the
    flattened (BH, nh*L) index — but with a PERMUTATION-AWARE backward.

    XLA differentiates take_along_axis into a scatter-add (it cannot know
    the indices are bijective per round); since each round's idx row IS a
    permutation of [0, L), the cotangent is exactly the inverse gather:
    dx[b, j] = sum_r g[b, r, inv[b, r, j]].  Gathers beat scatters on this
    backend (BENCH.md r4 "gather fusion"), and the rule is exact — every
    source row receives exactly nh cotangent rows.

    idx, inv: (BH, nh, L) int32 with inv[b, r] = argsort(idx[b, r])."""
    bh, nh, l = idx.shape
    return jnp.take_along_axis(x, idx.reshape(bh, nh * l)[..., None], axis=1)


def _perm_rows_take_fwd(x, idx, inv):
    return _perm_rows_take(x, idx, inv), (idx, inv)


def _perm_rows_take_bwd(res, g):
    idx, inv = res
    bh, nh, l = idx.shape
    gr = g.reshape(bh, nh, l, g.shape[-1])
    dx = jnp.take_along_axis(gr, inv[..., None], axis=2).sum(axis=1)
    return dx, None, None


_perm_rows_take.defvjp(_perm_rows_take_fwd, _perm_rows_take_bwd)


@jax.custom_vjp
def _perm_round_take(x: jnp.ndarray, idx: jnp.ndarray,
                     inv: jnp.ndarray) -> jnp.ndarray:
    """Within-round row permutation on (B, H, nh, L, W):
    out[..., r, s, :] = x[..., r, idx[..., r, s], :], with the
    inverse-gather backward (see _perm_rows_take)."""
    return jnp.take_along_axis(x, idx[..., None], axis=3)


def _perm_round_take_fwd(x, idx, inv):
    return _perm_round_take(x, idx, inv), (idx, inv)


def _perm_round_take_bwd(res, g):
    idx, inv = res
    return jnp.take_along_axis(g, inv[..., None], axis=3), None, None


_perm_round_take.defvjp(_perm_round_take_fwd, _perm_round_take_bwd)


def _look_adjacent(x: jnp.ndarray, before: int, after: int) -> jnp.ndarray:
    """(..., nc, c, ...) -> concat of rolled chunk neighbors on the c axis.

    Chunk i sees chunks [i-before, ..., i, ..., i+after] (wrapping — the
    wrap is masked out later via positions/validity)."""
    if before == 0 and after == 0:
        return x
    # chunk i of roll(x, shift=-off) is original chunk i+off; order the key
    # axis as [i-before, ..., i, ..., i+after]
    slices = [jnp.roll(x, shift=-off, axis=-3) for off in range(-before, after + 1)]
    return jnp.concatenate(slices, axis=-2)


def positional_dropout(
    probs: jnp.ndarray,     # (..., Lq, Lk) attention probs
    q_pos: jnp.ndarray,     # (..., Lq) ORIGINAL query positions, int
    k_pos: jnp.ndarray,     # (..., Lk) ORIGINAL key positions, int
    lane: jnp.ndarray,      # (...)-broadcastable int32 lane id (bh/round)
    seed_u32: jax.Array,    # uint32 scalar (dropout_seed_from_key(rng))
    rate: float,
) -> jnp.ndarray:
    """Attention-probs dropout as a counter-hash of ORIGINAL positions.

    keep(i, j) is a pure function of (seed, lane, q_pos=i, k_pos=j) — the
    same lowbias32 draw the flash kernel regenerates tile-wise
    (rtts/ops/flash_attention.py) — so the mask is invariant to the bucket
    permutation AND to how the chunk axis is split across devices: the
    sequence-parallel attend reproduces the single-device mask exactly from
    the same seed (VERDICT r3 item 3).  Inverted scaling (1/keep_prob), like
    every other dropout in the framework."""
    from rtts.ops.flash_attention import _drop_threshold, _keep_tile

    thr = _drop_threshold(rate)
    seed_i32 = jax.lax.bitcast_convert_type(
        jnp.asarray(seed_u32, jnp.uint32), jnp.int32)
    keep = _keep_tile(seed_i32, lane,
                      q_pos[..., :, None].astype(jnp.int32),
                      k_pos[..., None, :].astype(jnp.int32), thr)
    return probs * (keep.astype(probs.dtype) / (1.0 - rate))


def dropout_lane(b: int, h: int, chunk_idx: jnp.ndarray,
                 chunks_per_round: int) -> jnp.ndarray:
    """(B, H, nc, 1, 1) int32 lane ids for ``positional_dropout`` over a
    chunked attend: lane = round * (B*H) + b*H + h, so hash rounds draw
    independent masks while the id stays derivable from GLOBAL chunk
    indices alone (sharding-invariant — the seq-parallel attend passes its
    global ``chunk_idx = lo + arange(nc_local)``)."""
    rounds = chunk_idx.astype(jnp.int32) // chunks_per_round
    bh = (jnp.arange(b, dtype=jnp.int32)[:, None] * h
          + jnp.arange(h, dtype=jnp.int32)[None, :])
    lane = rounds[None, None, :] * (b * h) + bh[:, :, None]
    return lane[..., None, None]


def lsh_attend_chunks(
    q: jnp.ndarray,        # (B,H,nc,c,d) sorted queries
    k: jnp.ndarray,        # (B,H,nc,c,d) sorted normalized keys
    v: jnp.ndarray,        # (B,H,nc,c,d) sorted values
    q_pos: jnp.ndarray,    # (B,H,nc,c) original positions
    k_valid: jnp.ndarray,  # (B,H,nc,c) key validity (pad mask)
    causal: bool,
    before: int,
    after: int,
    mask_value: float = MASK_VALUE,
    self_mask_value: float = SELF_MASK_VALUE,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    chunks_per_round: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-chunk attend with neighbor lookback.
    Returns (out (B,H,nc,c,d), logsumexp (B,H,nc,c)).

    ``dropout_rate``/``dropout_rng``: attention-probs dropout applied after
    the per-chunk softmax (reference lineage's LSHAttention dropout,
    SURVEY.md §3.2 config row), drawn per ORIGINAL (round, q_pos, k_pos) by
    ``positional_dropout`` — permutation- and sharding-invariant, so the
    seq-parallel path reproduces the identical mask.  ``chunks_per_round``
    (= L/c; default: all chunks one round) keys rounds independently.  The
    returned logsumexp is of the UNdropped distribution — the multi-round
    combine weights stay deterministic, only the per-round value mixtures
    are regularized (matching the torch lineage, which also drops probs
    after computing the round logits)."""
    k_adj = _look_adjacent(k, before, after)
    v_adj = _look_adjacent(v, before, after)
    k_pos = _look_adjacent(q_pos[..., None], before, after)[..., 0]
    k_val = _look_adjacent(k_valid[..., None], before, after)[..., 0]

    scores = jnp.einsum("bhnqd,bhnkd->bhnqk", q, k_adj).astype(jnp.float32)
    scores = jnp.where(k_val[..., None, :], scores, mask_value)
    if causal:
        scores = jnp.where(
            q_pos[..., :, None] >= k_pos[..., None, :], scores, mask_value)
    scores = jnp.where(
        q_pos[..., :, None] == k_pos[..., None, :], self_mask_value, scores)

    lse = jax.nn.logsumexp(scores, axis=-1)                      # (B,H,nc,c)
    probs = jnp.exp(scores - lse[..., None])
    if dropout_rng is not None and dropout_rate > 0.0:
        from rtts.ops.flash_attention import dropout_seed_from_key

        b, h, nc = q.shape[:3]
        lane = dropout_lane(b, h, jnp.arange(nc), chunks_per_round or nc)
        probs = positional_dropout(probs, q_pos, k_pos, lane,
                                   dropout_seed_from_key(dropout_rng),
                                   dropout_rate)
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", probs.astype(v_adj.dtype), v_adj)
    return out, lse


def _sort_gather_mode(cfg: AttentionConfig, bh: int, nh: int, l: int,
                      dtype) -> str:
    """Resolve cfg.sort_gather ("auto" -> "onehot" while the one-hot
    permutation operand stays under ~4 GB; "take" beyond — the one-hot
    matmul's FLOPs grow as L^2 per row while take_along_axis stays
    linear.  Measured on v5e (BENCH.md r3): onehot wins 2.6x at flagship
    L=1024 and still 1.14x/1.07x at oh sizes 1.1/2.1 GB (L=2048/4096);
    the 8.6 GB 8k-longform case stays on take."""
    if cfg.sort_gather != "auto":
        if cfg.sort_gather not in ("onehot", "take"):
            raise ValueError(f"unknown sort_gather {cfg.sort_gather!r}")
        return cfg.sort_gather
    oh_bytes = bh * nh * l * l * jnp.dtype(dtype).itemsize
    return "onehot" if oh_bytes <= (1 << 32) else "take"


def _pick_attend_fn(cfg: AttentionConfig, seq_len: int):
    """Fused Pallas chunk-attend vs the jnp reference, per the use_pallas
    knob.  "auto" = kernel on TPU from 8192 positions — the measured
    crossover side where its in-VMEM scores beat XLA's restreamed path
    (BENCH.md r4 "8k step sweep"; at 1024 XLA wins, BENCH.md r2) — and
    the jnp path below / off-TPU (interpret mode is for tests, not speed,
    so "auto" never selects it).  Explicit true keeps interpret-mode CPU
    testability."""
    use = cfg.use_pallas
    on_tpu = jax.devices()[0].platform == "tpu"
    if isinstance(use, str):
        if use != "auto":
            raise ValueError(
                f"use_pallas must be true, false or 'auto', got {use!r}")
        use = on_tpu and seq_len >= 8192
    if not use:
        return lsh_attend_chunks

    from rtts.ops.lsh_attention import lsh_attend_chunks_pallas

    return functools.partial(lsh_attend_chunks_pallas,
                             interpret=not on_tpu)


def lsh_attention_core(
    qk: jnp.ndarray,       # (B, H, L, d)
    v: jnp.ndarray,        # (B, H, L, d)
    cfg: AttentionConfig,
    mask: Optional[jnp.ndarray],   # (B, L) bool
    causal: bool,
    rng: jax.Array,
    buckets: Optional[jnp.ndarray] = None,   # cached (B,H,nh,L)
    attend_fn=None,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full LSH pipeline on projected heads. Returns (out (B,H,L,d), buckets).

    ``attend_fn`` is the chunk-attend stage — swapped for the Pallas kernel
    in the fused path; everything else (hash/sort/unsort/combine) is shared.
    ``dropout_rng`` (with cfg.attention_dropout > 0) enables attention-probs
    dropout; the Pallas kernel has no dropout support, so an active dropout
    forces the jnp attend stage (training-only — serving is deterministic).
    """
    b, h, l, d = qk.shape
    c = cfg.chunk_length
    nh = cfg.num_hashes
    drop_active = dropout_rng is not None and cfg.attention_dropout > 0.0
    if drop_active:
        import functools

        # the Pallas kernel has no dropout support: active dropout forces
        # the jnp attend stage even over an explicitly passed attend_fn
        # (binding dropout kwargs onto a kernel would TypeError at trace)
        attend_fn = functools.partial(
            lsh_attend_chunks, dropout_rate=cfg.attention_dropout,
            dropout_rng=dropout_rng, chunks_per_round=l // c)
    elif attend_fn is None:
        attend_fn = _pick_attend_fn(cfg, l)
    if l % c != 0:
        raise ValueError(f"seq len {l} not a multiple of chunk {c} (autopad upstream)")
    nb = cfg.num_buckets or auto_num_buckets(l, c)
    if (total_buckets(nb) + 1) * l > 2**31 - 1:
        # _sort_by_bucket's stable-sort key is bucket * L + pos in int32; an
        # overflow would wrap negative and SILENTLY order slots across
        # unrelated buckets
        raise ValueError(
            f"int32 sort-key overflow: (total_buckets+1) * seq_len = "
            f"{(total_buckets(nb) + 1) * l} > 2^31-1 — reduce num_buckets "
            f"({nb}) or the sequence length ({l})")

    if buckets is None:
        buckets = hash_vectors(qk, nb, nh, rng, mask)            # (B,H,nh,L)

    sorted_pos, undo_idx, sorted_buckets = _sort_by_bucket(buckets)

    # gather q/k/v into per-round sorted order: (B,H,nh,L,d).
    # qk and v ride ONE packed operand (halves the per-row gather count);
    # "onehot" mode realizes the permutation as an MXU matmul — measured
    # 2.3x faster than take_along_axis on v5e with a matmul (not
    # scatter-add) backward, and bit-exact (exactly one matched element
    # per one-hot row).  BENCH.md r3 "LSH gather".
    mode = _sort_gather_mode(cfg, b * h, nh, l, qk.dtype)
    bh = b * h
    idx = sorted_pos.reshape(bh, nh * l)
    packed = jnp.concatenate([qk, v], axis=-1).reshape(bh, l, 2 * d)
    if mode == "onehot":
        oh = (idx[..., None] == jnp.arange(l, dtype=jnp.int32)[None, None, :]
              ).astype(packed.dtype)
        g = jnp.einsum("bsl,blw->bsw", oh, packed)
    else:
        # permutation-aware take: backward is the inverse-round gather,
        # not XLA's scatter-add (BENCH.md r4 "gather fusion")
        g = _perm_rows_take(packed, sorted_pos.reshape(bh, nh, l),
                            undo_idx.reshape(bh, nh, l))
    g = g.reshape(b, h, nh, l, 2 * d)
    qk_s, v_s = g[..., :d], g[..., d:]
    if mask is not None:
        # hash_vectors forced padding tokens into the overflow bucket, so
        # slot validity falls out of the sort itself — no mask gather
        # (width-1 row gathers cost as much as the payload gather here)
        valid_s = sorted_buckets < total_buckets(nb)
    else:
        valid_s = jnp.ones((b, h, nh, l), bool)

    # chunk the concatenated-rounds axis; L % c == 0 keeps rounds chunk-aligned
    nc = nh * l // c
    q_c = qk_s.reshape(b, h, nc, c, d)
    k_c = (_len_norm(qk_s) * (d ** -0.5)).reshape(b, h, nc, c, d)
    v_c = v_s.reshape(b, h, nc, c, d)
    pos_c = sorted_pos.reshape(b, h, nc, c)
    val_c = valid_s.reshape(b, h, nc, c)

    out_c, lse_c = attend_fn(q_c, k_c, v_c, pos_c, val_c, causal,
                             cfg.num_chunks_before, cfg.num_chunks_after,
                             cfg.mask_value, cfg.self_mask_value)

    # unsort per round (inverse permutation — never a scatter) and combine:
    # each round weighted by exp(lse - logsumexp(lse)).
    # NOTE: written exactly as the reference computes it (NOT jax.nn.softmax):
    # at degenerate rows (only the -1e5 self logit survives) float32 rounding
    # at |lse|~1e5 makes these weights sum to ~0.998 rather than 1, and the
    # torch lineage inherits that scaling — mirroring the formula keeps
    # cross-framework output parity bit-tight (verified vs HF in tests).
    out_flat = out_c.reshape(b, h, nh, l, d)
    lse_flat = lse_c.reshape(b, h, nh, l)
    if mode == "onehot":
        # fold the combine INTO the unsort matmul: weight each sorted slot
        # by its round's (re-sorted) combine weight, then one transposed
        # one-hot einsum sums the nh per-round contributions per position.
        lse_r = _perm_round_take(lse_flat[..., None], undo_idx,
                                 sorted_pos)[..., 0]
        if nh == 1:
            weighted = out_flat
        else:
            w = jnp.exp(lse_r - jax.nn.logsumexp(lse_r, axis=2, keepdims=True))
            w_s = _perm_round_take(w[..., None], sorted_pos,
                                   undo_idx)[..., 0]   # sorted domain
            weighted = out_flat * w_s.astype(out_flat.dtype)[..., None]
        out = jnp.einsum("bsl,bsd->bld", oh,
                         weighted.reshape(bh, nh * l, d)).reshape(b, h, l, d)
        return out, buckets
    if nh == 1:
        # no combine: unsort the output alone, skip the lse column
        out_r = _perm_round_take(out_flat, undo_idx, sorted_pos)
        return out_r[:, :, 0], buckets
    # undo gather fused: (out, lse) ride ONE f32 operand — row gathers here
    # are transaction-bound, so the separate width-1 lse gather cost as much
    # as the whole width-d out gather (BENCH.md r4 "gather fusion"); f32
    # keeps the combine math exactly as before (lse was always f32, and the
    # combine einsum already ran on f32 weights)
    fused = jnp.concatenate([out_flat.astype(jnp.float32),
                             lse_flat[..., None]], axis=-1)
    got = _perm_round_take(fused, undo_idx, sorted_pos)
    out_r, lse_r = got[..., :d], got[..., d]
    w = jnp.exp(lse_r - jax.nn.logsumexp(lse_r, axis=2, keepdims=True))
    out = jnp.einsum("bhnl,bhnld->bhld", w, out_r)
    return out, buckets


def lsh_self_attention(
    params,
    x: jnp.ndarray,               # (B, L, D)
    mask: Optional[jnp.ndarray],  # (B, L) bool
    causal: bool,
    cfg: AttentionConfig,
    rng: Optional[jax.Array],
    compute_dtype=None,
    cache: Optional[LshCache] = None,
    deterministic: bool = True,
) -> Tuple[jnp.ndarray, LshCache]:
    """Reformer LSH self-attention sublayer. Returns (out (B,L,D), cache).

    ``deterministic=False`` with ``cfg.attention_dropout > 0`` applies
    attention-probs dropout; the dropout key derives from the CALLER's rng
    (not the hash_seed override), so a fixed hash_seed keeps hashing
    deterministic while dropout still varies per step — and the reversible
    backward, which replays with the same aux rng, reproduces the exact mask.
    """
    l = x.shape[1]
    # dropout requires a CALLER rng: with rng=None a substituted constant
    # key would apply the identical mask every step (local.py skips too)
    drop_rng = (jax.random.fold_in(rng, 7)
                if (rng is not None and not deterministic
                    and cfg.attention_dropout > 0.0)
                else None)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if l <= cfg.chunk_length:
        # reference fallback: full softmax attention for short sequences
        out = shared_qk_self_attention(params, x, mask=mask, causal=causal,
                                       num_heads=cfg.num_heads,
                                       compute_dtype=compute_dtype,
                                       dropout_rate=cfg.attention_dropout,
                                       dropout_rng=drop_rng)
        return out, LshCache(buckets=jnp.zeros((0,), jnp.int32))

    if cfg.hash_seed is not None:
        rng = jax.random.PRNGKey(cfg.hash_seed)

    qk = _split_heads(dense(params["w_qk"], x, compute_dtype), cfg.num_heads)
    v = _split_heads(dense(params["w_v"], x, compute_dtype), cfg.num_heads)
    buckets = cache.buckets if cache is not None else None
    out, buckets = lsh_attention_core(qk, v, cfg, mask, causal, rng, buckets,
                                      dropout_rng=drop_rng)
    out = dense(params["w_o"], _merge_heads(out), compute_dtype)
    return out, LshCache(buckets=buckets)
