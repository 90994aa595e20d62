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
    assert cfg.model.decoder.attention.kind == "lsh"
    assert cfg.model.vocab_size > 0


def test_base_config_builds():
    cfg = base_bench_config()
    assert cfg.model.d_model == 256
