"""Pipeline-parallel stacks on the virtual 8-device mesh must match the
single-device plain-residual path (PARITY.md §3.4 — beyond-reference
parallelism row; rtts/parallel/pipeline.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from rtts.config import AttentionConfig, MeshConfig, ReformerStackConfig
from rtts.models.stack import stack_apply, stack_init
from rtts.parallel.mesh import make_mesh


def _cfg(num_layers=4, kind="full", causal=False, **kw):
    acfg = AttentionConfig(kind=kind, num_heads=2, head_dim=16,
                           num_hashes=2, num_buckets=8, chunk_length=16,
                           num_chunks_before=1, use_pallas=False,
                           flash=False)
    return ReformerStackConfig(num_layers=num_layers, d_model=32, d_ff=64,
                               dropout=0.0, reversible=False, causal=causal,
                               attention=acfg, use_pallas_ffn=False, **kw)


def _data(key, b=4, l=64, d=32, mem=False):
    x = jax.random.normal(key, (b, l, d))
    mask = jnp.arange(l)[None, :] < jnp.asarray([l, l - 9, l, l - 3])[:, None]
    if not mem:
        return x, mask, None, None
    memory = jax.random.normal(jax.random.fold_in(key, 2), (b, 48, d))
    mmask = jnp.arange(48)[None, :] < jnp.asarray([48, 40, 48, 30])[:, None]
    return x, mask, memory, mmask


@pytest.mark.parametrize("kind", ["full", "lsh"])
@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.parametrize("interleave", [1, 2])
def test_pipeline_matches_single_device(kind, cross, interleave):
    """Forward parity: 4 stages x 2 microbatches-per-stage-default,
    encoder (self only) and decoder (self + cross) units; interleave=2
    runs the circular schedule (each device holds 2 non-contiguous layer
    chunks, activations make 2 laps around the ring)."""
    n_dev = 4 // interleave
    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=n_dev))
    base = _cfg(kind=kind, causal=cross)
    key = jax.random.PRNGKey(0)
    params = stack_init(key, base, cross_attend=cross)
    x, mask, memory, mmask = _data(jax.random.fold_in(key, 1), mem=cross)

    ref = stack_apply(params, base, x, mask, memory=memory,
                      memory_mask=mmask, rng=jax.random.PRNGKey(5),
                      deterministic=True)
    pp = dataclasses.replace(base, pipeline_axis="model",
                             pipeline_interleave=interleave)
    with mesh:
        out = jax.jit(lambda p, xx: stack_apply(
            p, pp, xx, mask, memory=memory, memory_mask=mmask,
            rng=jax.random.PRNGKey(5), deterministic=True))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("remat,interleave", [(True, 1), (False, 1),
                                              (True, 2), (False, 2)])
def test_pipeline_grads_match_single_device(remat, interleave):
    """Autodiff through the scan+ppermute schedule == plain autograd.

    interleave=2 differentiates through the circular schedule's dynamic
    chunk indexing (transpose = dynamic-slice-add into the stacked tree)
    and a multi-group injection (M=4 over S=2 stages, 2 groups)."""
    n_dev = 4 // interleave
    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=n_dev))
    base = _cfg(num_layers=4, kind="full", causal=True)
    key = jax.random.PRNGKey(7)
    params = stack_init(key, base, cross_attend=True)
    x, mask, memory, mmask = _data(jax.random.fold_in(key, 1), mem=True)

    def loss(cfg):
        def fn(p, xx, mem):
            y = stack_apply(p, cfg, xx, mask, memory=mem,
                            memory_mask=mmask, rng=jax.random.PRNGKey(5),
                            deterministic=True)
            return jnp.sum(y * y)

        return fn

    ref_l, ref_g = jax.value_and_grad(loss(base), argnums=(0, 1, 2))(
        params, x, memory)
    pp = dataclasses.replace(base, pipeline_axis="model",
                             pipeline_remat=remat,
                             pipeline_interleave=interleave,
                             pipeline_microbatches=2 * interleave)
    with mesh:
        pp_l, pp_g = jax.jit(jax.value_and_grad(loss(pp),
                                                argnums=(0, 1, 2)))(
            params, x, memory)
    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=1e-5)
    flat_r, _ = jax.tree.flatten(ref_g)
    flat_p, _ = jax.tree.flatten(pp_g)
    for a, b in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5, rtol=3e-5)


def test_pipeline_composes_with_data_parallel():
    """dp=2 x pipe=4: batch sharded over data, stages over model."""
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    base = _cfg(num_layers=4, kind="full")
    key = jax.random.PRNGKey(2)
    params = stack_init(key, base, cross_attend=False)
    x, mask, _, _ = _data(jax.random.fold_in(key, 1))

    ref = stack_apply(params, base, x, mask, rng=jax.random.PRNGKey(5),
                      deterministic=True)
    pp = dataclasses.replace(base, pipeline_axis="model",
                             pipeline_microbatches=2)
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
        out = jax.jit(lambda p, xx, mm: stack_apply(
            p, pp, xx, mm, rng=jax.random.PRNGKey(5),
            deterministic=True))(params, xs, ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_composes_with_zero_sharding():
    """Full TTS train step: decoder staged over the pipe (model) axis,
    Adam moments ZeRO-sharded over data — loss and updated params match
    the replicated non-pipelined step.  Train mode at dropout 0: the
    pipeline's per-layer key schedule matches the sequential path exactly
    (fold_micro engages only when dropout needs it), so LSH hash draws
    and therefore the step numerics are identical."""
    import dataclasses as dc

    from rtts.config import OptimConfig
    from rtts.models import reformer_tts as M
    from rtts.parallel.sharding import (batch_sharding, make_param_shardings,
                                        opt_state_shardings)
    from rtts.text import vocab_size
    from rtts.train.optim import make_optimizer
    from rtts.train.train_tts import make_train_step
    from tests.test_model_lsh import lsh_cfg

    base = lsh_cfg(reversible=False)
    piped = dc.replace(base, decoder=dc.replace(base.decoder,
                                                pipeline_axis="model"))
    params = M.init(jax.random.PRNGKey(0), base)
    optimizer = make_optimizer(OptimConfig(warmup_steps=10, total_steps=100))
    key = jax.random.PRNGKey(9)
    B, L, T = 4, 64, 64
    batch = {
        "tokens": jax.random.randint(key, (B, L), 3, vocab_size()),
        "token_mask": jnp.ones((B, L), bool),
        "mel": jax.random.normal(key, (B, T, 20)) * 0.5,
        "mel_mask": jnp.ones((B, T), bool),
    }
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=2),
                     jax.devices()[:4])

    def run(cfg, zero):
        opt_state = optimizer.init(params)
        with mesh:
            p = jax.device_put(params,
                               make_param_shardings(params, mesh,
                                                    tensor_parallel=False))
            o = jax.device_put(opt_state,
                               opt_state_shardings(opt_state, mesh,
                                                   tensor_parallel=False,
                                                   zero=zero))
            b = {k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                 for k, v in batch.items()}
            step = jax.jit(make_train_step(cfg, optimizer))
            p, o, metrics = step(p, o, b, jax.random.PRNGKey(5))
        return p, float(metrics["loss"])

    p_ref, l_ref = run(base, zero=False)
    p_pp, l_pp = run(piped, zero=True)
    np.testing.assert_allclose(l_pp, l_ref, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), p_pp, p_ref)


@pytest.mark.parametrize("interleave", [1, 2])
def test_pipeline_dropout_independent_across_microbatches(interleave):
    """Training mode: each microbatch must draw its OWN dropout masks.

    A stage applies the same per-layer keys to every microbatch it sees;
    pipeline.py folds the microbatch index in, otherwise identical input
    rows in different microbatches would produce identical outputs.  At
    interleave=2 the fold uses the circular schedule's recovered
    microbatch index."""
    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=2))
    base = dataclasses.replace(_cfg(num_layers=2 * interleave), dropout=0.5)
    key = jax.random.PRNGKey(3)
    params = stack_init(key, base, cross_attend=False)
    row = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32))
    x = jnp.tile(row, (4, 1, 1))            # 4 identical rows
    mask = jnp.ones((4, 32), bool)
    pp = dataclasses.replace(base, pipeline_axis="model",
                             pipeline_interleave=interleave,
                             pipeline_microbatches=2)

    def run():
        with mesh:
            return jax.jit(lambda p, xx: stack_apply(
                p, pp, xx, mask, rng=jax.random.PRNGKey(9),
                deterministic=False))(params, x)

    out = np.asarray(run())
    # rows 0/1 ride microbatch 0, rows 2/3 microbatch 1: same input row,
    # different microbatch => different masks => different output
    assert np.abs(out[0] - out[2]).max() > 1e-3
    assert np.abs(out[1] - out[3]).max() > 1e-3
    # within a microbatch, rows draw distinct mask rows too
    assert np.abs(out[0] - out[1]).max() > 1e-3
    # deterministic given the step rng
    np.testing.assert_array_equal(out, np.asarray(run()))


def test_pipeline_validation_errors():
    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=4))
    key = jax.random.PRNGKey(0)
    x, mask, _, _ = _data(jax.random.fold_in(key, 1))

    # layers must divide over stages
    bad = dataclasses.replace(_cfg(num_layers=3), pipeline_axis="model")
    params3 = stack_init(key, bad, cross_attend=False)
    with mesh, pytest.raises(ValueError, match="divide over"):
        stack_apply(params3, bad, x, mask, deterministic=True)

    # interleave: layers must divide over v x S chunks
    badv = dataclasses.replace(_cfg(num_layers=4), pipeline_axis="model",
                               pipeline_interleave=2)  # 4 % (2*4) != 0
    paramsv = stack_init(key, badv, cross_attend=False)
    with mesh, pytest.raises(ValueError, match="pipeline_interleave"):
        stack_apply(paramsv, badv, x, mask, deterministic=True)

    # interleave: microbatches must come in groups of S
    badm = dataclasses.replace(_cfg(num_layers=8), pipeline_axis="model",
                               pipeline_interleave=2,
                               pipeline_microbatches=2)  # 2 % 4 != 0
    params8 = stack_init(key, badm, cross_attend=False)
    with mesh, pytest.raises(ValueError, match="groups of"):
        stack_apply(params8, badm, x, mask, deterministic=True)

    # uniform kinds required
    het = dataclasses.replace(
        _cfg(num_layers=4), pipeline_axis="model",
        attn_layers=["full", "lsh", "full", "lsh"])
    params4 = stack_init(key, het, cross_attend=False)
    with mesh, pytest.raises(ValueError, match="uniform attention kind"):
        stack_apply(params4, het, x, mask, deterministic=True)

    # explicit reversible=True is not silently ignored
    rev = dataclasses.replace(_cfg(num_layers=4), pipeline_axis="model",
                              reversible=True)
    with mesh, pytest.raises(ValueError, match="reversible"):
        stack_apply(params4, rev, x, mask, deterministic=True)

    # mutually exclusive with sequence parallelism
    both = dataclasses.replace(_cfg(num_layers=4), pipeline_axis="model",
                               seq_parallel_axis="model")
    with mesh, pytest.raises(ValueError, match="mutually exclusive"):
        stack_apply(params4, both, x, mask, deterministic=True)

    # needs a mesh with the axis
    nomesh = dataclasses.replace(_cfg(num_layers=4), pipeline_axis="model")
    with pytest.raises(ValueError, match="needs a Mesh"):
        stack_apply(params4, nomesh, x, mask, deterministic=True)
