"""Cross-framework fidelity tests against the HF Reformer implementation
(SURVEY.md §5.3 item 4): the locally-installed, line-verified oracle for the
exact LSH attention algorithms the reference builds on.

We map weights, inject HF's hash rotations (fixed hash_seed), and require
the full LSH pipeline output (hash -> sort -> chunked attend -> unsort ->
multi-round combine) to match HF's LSHSelfAttention to float tolerance —
and the same for the full-softmax fallback path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import ReformerConfig
from transformers.models.reformer.modeling_reformer import LSHSelfAttention

from rtts.attention.full import _split_heads
from rtts.attention.lsh import hash_vectors, lsh_attention_core
from rtts.config import AttentionConfig
from rtts.nn.layers import dense


HB, HL, HD_MODEL, HEADS, HDIM = 2, 64, 32, 2, 16
NB, NH, CHUNK, BEFORE = 8, 2, 16, 1


def _hf_attention(causal: bool, seq_len: int = HL):
    cfg = ReformerConfig(
        attention_head_size=HDIM, num_attention_heads=HEADS, num_hashes=NH,
        num_buckets=NB, lsh_attn_chunk_length=CHUNK,
        lsh_num_chunks_before=BEFORE, lsh_num_chunks_after=0,
        hidden_size=HD_MODEL, is_decoder=causal, attn_layers=["lsh"],
        hash_seed=0, lsh_attention_probs_dropout_prob=0.0,
        axial_pos_embds=False, max_position_embeddings=512)
    torch.manual_seed(42)
    att = LSHSelfAttention(cfg)
    att.eval()
    return att, cfg


def _hf_rotations(d: int):
    """Reproduce HF's rotation draw: manual_seed(hash_seed) then randn of
    (heads, d, n_hashes, nb // 2)."""
    torch.manual_seed(0)
    rot = torch.randn(HEADS, d, NH, NB // 2)
    return jnp.asarray(rot.numpy())


def _mapped_params(att):
    # torch Linear: y = x @ W.T  ->  our dense w = W.T
    return {
        "w_qk": {"w": jnp.asarray(att.query_key.weight.detach().numpy().T)},
        "w_v": {"w": jnp.asarray(att.value.weight.detach().numpy().T)},
    }


@pytest.mark.parametrize("causal", [False, True])
def test_lsh_attention_matches_hf(causal):
    att, _ = _hf_attention(causal)
    x = torch.randn(HB, HL, HD_MODEL, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        hf_out = att(x).hidden_states.numpy()          # (B, L, H*D) pre-W_o

    params = _mapped_params(att)
    xj = jnp.asarray(x.numpy())
    qk = _split_heads(dense(params["w_qk"], xj), HEADS)
    v = _split_heads(dense(params["w_v"], xj), HEADS)

    cfg = AttentionConfig(kind="lsh", num_heads=HEADS, head_dim=HDIM,
                          num_hashes=NH, num_buckets=NB, chunk_length=CHUNK,
                          num_chunks_before=BEFORE, num_chunks_after=0,
                          use_pallas=False)
    buckets = hash_vectors(qk, NB, NH, jax.random.PRNGKey(0), None,
                           rotations=_hf_rotations(HDIM))
    out, _ = lsh_attention_core(qk, v, cfg, None, causal,
                                jax.random.PRNGKey(0), buckets=buckets)
    ours = np.asarray(out.transpose(0, 2, 1, 3).reshape(HB, HL, -1))
    np.testing.assert_allclose(ours, hf_out, atol=2e-4, rtol=1e-3)


def test_hash_buckets_match_hf():
    """Bucket assignment parity: same rotations, same vectors -> identical
    bucket ids (before offsets)."""
    att, _ = _hf_attention(False)
    x = torch.randn(HB, HL, HD_MODEL, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        qk_t = att.query_key(x)
    qk_heads = qk_t.view(HB, HL, HEADS, HDIM).transpose(1, 2)  # (B,H,L,d)
    with torch.no_grad():
        hf_buckets = att._hash_vectors(qk_heads, num_hashes=NH,
                                       attention_mask=None)  # (B,H,nh*L)
    hf_b = hf_buckets.view(HB, HEADS, NH, HL).numpy()
    # strip HF's per-round offsets (round_i * num_buckets)
    hf_b = hf_b - (np.arange(NH) * NB)[None, None, :, None]

    qk_j = jnp.asarray(qk_heads.numpy())
    ours = np.asarray(hash_vectors(qk_j, NB, NH, jax.random.PRNGKey(0), None,
                                   rotations=_hf_rotations(HDIM)))
    np.testing.assert_array_equal(ours, hf_b)


def test_factorized_buckets_match_hf():
    """Factorized num_buckets ([4, 4]): rotation blocks + mixed-radix
    combine must give bit-equal buckets and matching attention output."""
    factors = [4, 4]
    cfg_hf = ReformerConfig(
        attention_head_size=HDIM, num_attention_heads=HEADS, num_hashes=NH,
        num_buckets=factors, lsh_attn_chunk_length=CHUNK,
        lsh_num_chunks_before=BEFORE, lsh_num_chunks_after=0,
        hidden_size=HD_MODEL, is_decoder=False, attn_layers=["lsh"],
        hash_seed=0, lsh_attention_probs_dropout_prob=0.0,
        axial_pos_embds=False, max_position_embeddings=512)
    torch.manual_seed(42)
    att = LSHSelfAttention(cfg_hf)
    att.eval()
    x = torch.randn(HB, HL, HD_MODEL,
                    generator=torch.Generator().manual_seed(13))
    with torch.no_grad():
        hf_out = att(x).hidden_states.numpy()

    rot_size = sum(factors)
    torch.manual_seed(0)
    rot = jnp.asarray(torch.randn(HEADS, HDIM, NH, rot_size // 2).numpy())
    params = _mapped_params(att)
    xj = jnp.asarray(x.numpy())
    qk = _split_heads(dense(params["w_qk"], xj), HEADS)
    v = _split_heads(dense(params["w_v"], xj), HEADS)

    buckets = hash_vectors(qk, factors, NH, jax.random.PRNGKey(0), None,
                           rotations=rot)
    # bucket parity vs HF's internal hashing
    qk_t = x @ torch.from_numpy(np.asarray(params["w_qk"]["w"]))
    qk_heads = qk_t.view(HB, HL, HEADS, HDIM).transpose(1, 2)
    with torch.no_grad():
        hf_b = att._hash_vectors(qk_heads, num_hashes=NH,
                                 attention_mask=None)
    nb_total = factors[0] * factors[1]
    hf_b = (hf_b.view(HB, HEADS, NH, HL).numpy()
            - (np.arange(NH) * nb_total)[None, None, :, None])
    np.testing.assert_array_equal(np.asarray(buckets), hf_b)

    cfg = AttentionConfig(kind="lsh", num_heads=HEADS, head_dim=HDIM,
                          num_hashes=NH, num_buckets=factors,
                          chunk_length=CHUNK, num_chunks_before=BEFORE,
                          num_chunks_after=0, use_pallas=False)
    out, _ = lsh_attention_core(qk, v, cfg, None, False,
                                jax.random.PRNGKey(0), buckets=buckets)
    ours = np.asarray(out.transpose(0, 2, 1, 3).reshape(HB, HL, -1))
    np.testing.assert_allclose(ours, hf_out, atol=2e-4, rtol=1e-3)


def test_full_fallback_matches_hf_short_seq():
    """seq_len <= chunk: HF runs exact full attention; so do we."""
    att, cfg_hf = _hf_attention(True, seq_len=CHUNK)
    x = torch.randn(HB, CHUNK, HD_MODEL,
                    generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        hf_out = att(x).hidden_states.numpy()

    from rtts.attention.full import shared_qk_self_attention

    params = _mapped_params(att)
    params["w_o"] = {"w": jnp.eye(HD_MODEL)}  # identity: HF output is pre-W_o
    ours = shared_qk_self_attention(params, jnp.asarray(x.numpy()),
                                    mask=None, causal=True, num_heads=HEADS)
    np.testing.assert_allclose(np.asarray(ours), hf_out, atol=2e-4, rtol=1e-3)


def test_axial_posenc_matches_hf():
    """Axial positional embeddings: inject HF's factor weights into our
    params; at L == d1*d2 (HF's training requirement) the flattened
    embeddings must match exactly (same broadcast + concat + row-major
    reshape semantics)."""
    import torch
    from transformers.models.reformer.modeling_reformer import (
        AxialPositionEmbeddings,
    )
    from transformers import ReformerConfig

    from rtts.nn.posenc import axial_posenc, axial_posenc_init

    d1, d2, f1, f2 = 4, 8, 6, 10
    hf_cfg = ReformerConfig(
        axial_pos_shape=[d1, d2], axial_pos_embds_dim=[f1, f2],
        hidden_size=f1 + f2, hidden_dropout_prob=0.0,
        attn_layers=["local"], local_attn_chunk_length=8)
    hf = AxialPositionEmbeddings(hf_cfg).eval()
    with torch.no_grad():
        for w in hf.weights:
            w.normal_(0, 0.5)
    L = d1 * d2
    pos_ids = torch.arange(L)[None]
    hf_out = hf(pos_ids).detach().numpy()[0]          # (L, f1+f2)

    params = axial_posenc_init(jax.random.PRNGKey(0), (d1, d2), (f1, f2))
    params = {
        "ax1": jnp.asarray(hf.weights[0].detach().numpy()),  # (d1, 1, f1)
        "ax2": jnp.asarray(hf.weights[1].detach().numpy()),  # (1, d2, f2)
    }
    x = jnp.zeros((1, L, f1 + f2))
    ours = np.asarray(axial_posenc(params, x))[0]
    np.testing.assert_allclose(ours, hf_out, atol=1e-6)
