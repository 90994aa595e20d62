"""LSH attention unit tests (SURVEY.md §5.3 item 1).

Key property: with one hash round and a chunk covering the whole sequence,
the full LSH machinery (hash -> sort -> chunk-attend -> unsort -> combine)
must reproduce full shared-QK softmax attention exactly — the permutation
cancels and masking is by original positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.attention.full import (
    _len_norm,
    _split_heads,
    attention_init,
    shared_qk_self_attention,
)
from rtts.attention.lsh import (
    LshCache,
    _look_adjacent,
    _sort_by_bucket,
    auto_num_buckets,
    hash_vectors,
    lsh_attention_core,
    lsh_self_attention,
)
from rtts.config import AttentionConfig


def _full_reference(qk, v, mask, causal):
    """Oracle: dense shared-QK attention on raw head tensors."""
    from rtts.attention.full import shared_qk_scores_mask

    d = qk.shape[-1]
    k = _len_norm(qk) * (d ** -0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qk, k).astype(jnp.float32)
    b, h, l, _ = qk.shape
    pos = jnp.arange(l)
    scores = shared_qk_scores_mask(
        scores, pos[None, None, :], pos[None, None, :],
        mask[:, None, :] if mask is not None else None, causal)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


@pytest.fixture
def head_tensors():
    key = jax.random.PRNGKey(0)
    b, h, l, d = 2, 2, 64, 16
    qk = jax.random.normal(key, (b, h, l, d))
    v = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d))
    mask = jnp.arange(l)[None, :] < jnp.asarray([l, l - 10])[:, None]
    return qk, v, mask


def test_auto_num_buckets():
    assert auto_num_buckets(1024, 64) == 32
    assert auto_num_buckets(100, 64) == 4   # raw=3 -> pow2 -> 4
    assert auto_num_buckets(8192, 64) == 256


def test_hash_vectors_deterministic_and_padded(head_tensors):
    qk, _, mask = head_tensors
    b1 = hash_vectors(qk, 8, 2, jax.random.PRNGKey(3), mask)
    b2 = hash_vectors(qk, 8, 2, jax.random.PRNGKey(3), mask)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert b1.shape == (2, 2, 2, 64)
    # padding tokens land in the overflow bucket
    assert (np.asarray(b1)[1, :, :, -10:] == 8).all()
    assert (np.asarray(b1)[0] < 8).all()
    # nearby vectors hash together: duplicate vector -> same bucket
    qk_dup = qk.at[:, :, 1].set(qk[:, :, 0])
    b3 = hash_vectors(qk_dup, 8, 2, jax.random.PRNGKey(3), None)
    np.testing.assert_array_equal(np.asarray(b3[:, :, :, 0]),
                                  np.asarray(b3[:, :, :, 1]))


def test_sort_round_trip(head_tensors):
    qk, _, mask = head_tensors
    buckets = hash_vectors(qk, 8, 3, jax.random.PRNGKey(5), mask)
    sorted_pos, undo, sorted_buckets = _sort_by_bucket(buckets)
    # sorted_buckets = bucket id per sorted slot (rides the same sort);
    # validity (padding = overflow bucket 8) must equal the gathered mask
    mb = jnp.broadcast_to(mask[:, None, None, :], buckets.shape)
    valid_gathered = jnp.take_along_axis(mb, sorted_pos, axis=3)
    np.testing.assert_array_equal(np.asarray(sorted_buckets < 8),
                                  np.asarray(valid_gathered))
    np.testing.assert_array_equal(
        np.asarray(sorted_buckets),
        np.asarray(jnp.take_along_axis(buckets, sorted_pos, axis=3)))
    # each round's sorted_pos is a permutation
    sp = np.asarray(sorted_pos)
    for bi in range(sp.shape[0]):
        for hi in range(sp.shape[1]):
            for ri in range(sp.shape[2]):
                assert sorted(sp[bi, hi, ri].tolist()) == list(range(64))
    # gather-then-undo is identity
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 2, 3, 64, 5))
    xs = jnp.take_along_axis(x, sorted_pos[..., None], axis=3)
    xu = jnp.take_along_axis(xs, undo[..., None], axis=3)
    np.testing.assert_array_equal(np.asarray(xu), np.asarray(x))
    # stable: within a bucket, positions ascend
    b0 = np.asarray(buckets)[0, 0, 0]
    order = sp[0, 0, 0]
    sorted_buckets = b0[order]
    for i in range(63):
        if sorted_buckets[i] == sorted_buckets[i + 1]:
            assert order[i] < order[i + 1]


def test_look_adjacent():
    x = jnp.arange(4 * 2 * 1).reshape(1, 1, 4, 2, 1)  # (B,H,nc=4,c=2,d=1)
    y = _look_adjacent(x, before=1, after=0)
    assert y.shape == (1, 1, 4, 4, 1)
    got = np.asarray(y)[0, 0, :, :, 0]
    # chunk i key axis = [chunk i-1 (wrapped), chunk i]
    np.testing.assert_array_equal(got[1], [0, 1, 2, 3])
    np.testing.assert_array_equal(got[0], [6, 7, 0, 1])  # wrap


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("n_hashes", [1, 4])
def test_single_chunk_equals_full(head_tensors, causal, n_hashes):
    """chunk == L: LSH machinery must equal dense shared-QK attention."""
    qk, v, mask = head_tensors
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=16,
                          num_hashes=n_hashes, chunk_length=64,
                          num_chunks_before=0, num_chunks_after=0)
    ref = _full_reference(qk, v, mask, causal)
    out, buckets = lsh_attention_core(qk, v, cfg, mask, causal,
                                      jax.random.PRNGKey(7))
    o, r = np.asarray(out), np.asarray(ref)
    if causal and n_hashes > 1:
        # position 0 (self-only row): the reference-faithful multi-round
        # combine scales by ~0.998 vs exact softmax (see lsh.py combine note)
        o, r = o[:, :, 1:], r[:, :, 1:]
    np.testing.assert_allclose(o, r, atol=1e-4, rtol=1e-4)


def test_lsh_approximates_full_attention(head_tensors):
    """Real LSH config: outputs should be close to full attention (sparse
    approximation) and exact rows (self+neighbors in same bucket) finite."""
    qk, v, mask = head_tensors
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=16,
                          num_hashes=8, chunk_length=16, num_chunks_before=1)
    ref = _full_reference(qk, v, mask, False)
    out, _ = lsh_attention_core(qk, v, cfg, mask, False, jax.random.PRNGKey(8))
    # masked (pad) queries excluded from comparison
    m = np.broadcast_to(np.asarray(mask)[:, None, :, None], np.asarray(out).shape)
    a, r = np.asarray(out) * m, np.asarray(ref) * m
    # cosine similarity per valid row should be high on average
    num = (a * r).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(r, axis=-1) + 1e-9
    cos = (num / den)[m[..., 0] > 0]
    assert cos.mean() > 0.8, cos.mean()


def test_causal_no_future_leakage():
    """Perturbing future inputs must not change past outputs (causal LSH)."""
    key = jax.random.PRNGKey(11)
    b, h, l, d = 1, 2, 128, 16
    qk = jax.random.normal(key, (b, h, l, d))
    v = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d))
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=32, num_chunks_before=1, hash_seed=13)
    out1, _ = lsh_attention_core(qk, v, cfg, None, True, jax.random.PRNGKey(13))
    # change the last 16 positions' values only (buckets depend on qk — keep
    # qk fixed so the permutation is identical, values differ)
    v2 = v.at[:, :, -16:].add(100.0)
    out2, _ = lsh_attention_core(qk, v2, cfg, None, True, jax.random.PRNGKey(13))
    np.testing.assert_allclose(np.asarray(out1[:, :, :64]),
                               np.asarray(out2[:, :, :64]), atol=1e-5)


def test_bucket_cache_reuse(head_tensors):
    """Passing cached buckets skips re-hash: same output, even with a
    different rng (the reversible-backward contract)."""
    qk, v, mask = head_tensors
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1)
    out1, buckets = lsh_attention_core(qk, v, cfg, mask, False,
                                       jax.random.PRNGKey(1))
    out2, _ = lsh_attention_core(qk, v, cfg, mask, False,
                                 jax.random.PRNGKey(999), buckets=buckets)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_sublayer_fallback_short_seq():
    """L <= chunk uses the dense fallback and matches it exactly."""
    key = jax.random.PRNGKey(2)
    params = attention_init(key, 32, 2, 16, shared_qk=True)
    x = jax.random.normal(key, (2, 16, 32))
    mask = jnp.ones((2, 16), bool)
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, chunk_length=64)
    out, cache = lsh_self_attention(params, x, mask, False, cfg,
                                    jax.random.PRNGKey(0))
    ref = shared_qk_self_attention(params, x, mask=mask, causal=False, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_local_attention_matches_full_when_window_covers():
    """Local attention with lookback covering everything == full attention."""
    key = jax.random.PRNGKey(3)
    b, h, l, d = 2, 2, 64, 16
    qk = jax.random.normal(key, (b, h, l, d))
    v = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d))
    mask = jnp.ones((b, l), bool)
    from rtts.attention.local import local_attention_core

    cfg = AttentionConfig(kind="local", num_heads=2, head_dim=16,
                          chunk_length=16, num_chunks_before=3,
                          num_chunks_after=0)
    # lookback covers all earlier chunks (4 distinct chunks in window);
    # wrapped future chunks are killed by the causal mask
    out = local_attention_core(qk, v, cfg, mask, causal=True)
    ref = _full_reference(qk, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_lsh_gradients_flow(head_tensors):
    qk, v, mask = head_tensors
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1)

    def f(qk, v):
        out, _ = lsh_attention_core(qk, v, cfg, mask, False, jax.random.PRNGKey(4))
        return jnp.sum(out ** 2)

    g_qk, g_v = jax.grad(f, argnums=(0, 1))(qk, v)
    assert np.isfinite(np.asarray(g_qk)).all()
    assert np.isfinite(np.asarray(g_v)).all()
    assert float(jnp.abs(g_v).sum()) > 0
