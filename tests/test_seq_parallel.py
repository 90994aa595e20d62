"""Sequence-parallel LSH attention over the virtual 8-device mesh must be
numerically identical to the single-device pipeline (SURVEY.md §5.3.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from rtts.attention.lsh import hash_vectors, lsh_attention_core
from rtts.config import AttentionConfig, MeshConfig
from rtts.parallel.mesh import make_mesh
from rtts.parallel.seq_parallel import lsh_attention_seq_parallel


@pytest.mark.parametrize("causal", [False, True])
def test_seq_parallel_matches_single_device(causal):
    n_dev = 4
    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=n_dev))
    b, h, l, d = 2, 2, 256, 32
    nh, nb, c = 2, 8, 32
    key = jax.random.PRNGKey(0)
    qk = jax.random.normal(key, (b, h, l, d))
    v = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d))
    mask = jnp.arange(l)[None, :] < jnp.asarray([l, l - 40])[:, None]
    rotations = jax.random.normal(jax.random.PRNGKey(7), (h, d, nh, nb // 2))

    cfg = AttentionConfig(kind="lsh", num_heads=h, head_dim=d, num_hashes=nh,
                          num_buckets=nb, chunk_length=c, num_chunks_before=1,
                          num_chunks_after=0, use_pallas=False)

    # single-device reference with the same injected rotations
    buckets = hash_vectors(qk, nb, nh, jax.random.PRNGKey(0), mask,
                           rotations=rotations)
    ref, _ = lsh_attention_core(qk, v, cfg, mask, causal,
                                jax.random.PRNGKey(0), buckets=buckets)

    with mesh:
        shard = NamedSharding(mesh, P(None, None, "model", None))
        qk_s = jax.device_put(qk, shard)
        v_s = jax.device_put(v, shard)
        mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, "model")))
        out = lsh_attention_seq_parallel(qk_s, v_s, cfg, mask_s, causal,
                                         rotations, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_seq_parallel_under_jit():
    n_dev = 8
    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=n_dev))
    b, h, l, d = 1, 2, 512, 16
    nh, nb, c = 1, 8, 64
    key = jax.random.PRNGKey(1)
    qk = jax.random.normal(key, (b, h, l, d))
    v = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d))
    rotations = jax.random.normal(jax.random.PRNGKey(2), (h, d, nh, nb // 2))
    cfg = AttentionConfig(kind="lsh", num_heads=h, head_dim=d, num_hashes=nh,
                          num_buckets=nb, chunk_length=c, num_chunks_before=1,
                          use_pallas=False)
    with mesh:
        fn = jax.jit(lambda a, bb: lsh_attention_seq_parallel(
            a, bb, cfg, None, True, rotations, mesh))
        out = fn(qk, v)
    buckets = hash_vectors(qk, nb, nh, jax.random.PRNGKey(0), None,
                           rotations=rotations)
    ref, _ = lsh_attention_core(qk, v, cfg, None, True, jax.random.PRNGKey(0),
                                buckets=buckets)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
