"""Bench harness helpers: MFU plumbing + flagship config load (CPU)."""

import jax
import jax.numpy as jnp

from rtts.bench import (
    _compiled_flops,
    _device_peak_flops,
    _mfu,
    base_bench_config,
    flagship_bench_config,
)


def test_compiled_flops_exact_matmul():
    f = _compiled_flops(lambda a: a @ a, jnp.ones((128, 128)))
    assert f == 2 * 128 ** 3


def test_mfu_none_without_peak_or_flops():
    # CPU has no peak entry -> mfu None; missing flops -> None
    if _device_peak_flops() is None:
        assert _mfu(1e9, 1.0) is None
    assert _mfu(None, 1.0) is None


def test_flagship_config_is_advertised_scale():
    cfg = flagship_bench_config()
    assert cfg.model.d_model == 512
    assert cfg.model.encoder.num_layers == 6
    # round 3: the flagship ships length-aware attention (full at its
    # 1024-frame training length, LSH past the measured crossover)
    assert cfg.model.decoder.attention.kind == "auto"
    assert cfg.model.vocab_size > 0


def test_base_config_builds():
    cfg = base_bench_config()
    assert cfg.model.d_model == 256


def test_staged_flops_affine_interpolation_is_exact():
    """_decode_flops interpolates per-step FLOPs from the two extreme
    stage sizes on the claim that per-step cost is affine in the cache
    length (attention terms linear, rest constant).  Pin that claim:
    the exact per-step cost at the MIDDLE stage size must land on the
    line through the extremes."""
    import dataclasses

    from rtts.bench import _build, _compiled_flops
    from rtts.infer.decode import (
        _init_mem_kv,
        _init_state,
        _make_step_fn,
        _dtype,
    )

    cfg = base_bench_config()
    m = cfg.model
    mk = lambda s: dataclasses.replace(
        s, num_layers=2, d_model=64, d_ff=128,
        attention=dataclasses.replace(s.attention, num_heads=2,
                                      head_dim=32, chunk_length=16,
                                      num_hashes=2))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        m, d_model=64, dec_prenet_hidden=32, postnet_channels=32,
        encoder=mk(m.encoder), decoder=mk(m.decoder),
        compute_dtype="float32"))
    params = _build(cfg)
    mcfg = cfg.model
    cdt = _dtype(mcfg.compute_dtype)
    memory = jnp.zeros((2, 16, mcfg.d_model), cdt)
    mem_k, mem_v = _init_mem_kv(params, mcfg, memory, cdt)
    step = _make_step_fn(params, mcfg, mem_k, mem_v,
                         jnp.ones((2, 16), bool), jax.random.PRNGKey(0),
                         2.0)

    def f_at(size):
        return _compiled_flops(step, _init_state(params, mcfg, 2, size))

    f64, f128, f256 = f_at(64), f_at(128), f_at(256)
    assert f64 is not None and f128 is not None and f256 is not None
    slope = (f256 - f64) / (256 - 64)
    predicted_mid = f64 + slope * (128 - 64)
    assert abs(predicted_mid - f128) <= 1e-6 * f128, (predicted_mid, f128)


def test_bench_latency_smoke():
    """bench --which latency shape contract on a tiny CPU config: per-
    concurrency rows with batch/pool wall latency + engine p50/p95, and a
    streaming TTFA sweep entry per chunk size."""
    from rtts.bench import bench_latency
    from rtts.config import Config, from_dict
    from rtts.text import vocab_size

    cfg = from_dict(Config, {
        "model": {"vocab_size": vocab_size(), "d_model": 32, "n_mels": 20,
                  "dec_prenet_hidden": 32, "max_pos": 512,
                  "compute_dtype": "float32",
                  "encoder": {"num_layers": 1, "d_model": 32, "d_ff": 64,
                              "causal": False,
                              "attention": {"kind": "full", "num_heads": 2,
                                            "head_dim": 16,
                                            "chunk_length": 16}},
                  "decoder": {"num_layers": 1, "d_model": 32, "d_ff": 64,
                              "causal": True,
                              "attention": {"kind": "full", "num_heads": 2,
                                            "head_dim": 16,
                                            "chunk_length": 16}}},
        "dataset": {"audio": {"n_mels": 20}},
        "vocoder": {"n_mels": 20, "n_flows": 2, "n_group": 16,
                    "n_early_every": 4, "n_early_size": 4, "wn_layers": 2,
                    "wn_channels": 16, "hop_length": 16,
                    "audio_segment_length": 256},
    })
    r = bench_latency(cfg, concurrency=(2,), repeats=1, chunk_sweep=(32,),
                      max_frames=64)
    row = r["per_concurrency"]["2"]
    for key in ("batch_latency_s", "pool_latency_s", "engine_p50_s",
                "engine_p95_s", "engine_drain_s"):
        assert row[key] > 0
    assert row["engine_p50_s"] <= row["engine_p95_s"] <= row["engine_drain_s"]
    st = r["streaming_ttfa"]["32"]
    assert 0 < st["ttfa_s"] <= st["total_s"]
    assert st["n_chunks"] >= 1
