"""The flash kernel's trace-time FLOP accounting (rtts/ops/flash_attention
.py::track_flops): XLA cost analysis cannot see inside a Mosaic custom call,
so rtts/bench.py::_compiled_flops adds these analytic counts to keep MFU
honest when the flash path engages (BENCH.md r3)."""

import jax
import jax.numpy as jnp
import pytest

from rtts.ops import flash_attention as FA

B, H, L, DH = 2, 2, 256, 64


def _qkv(l_q=L, l_k=L):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, l_q, DH))
    k = jax.random.normal(ks[1], (B, H, l_k, DH))
    v = jax.random.normal(ks[2], (B, H, l_k, DH))
    return q, k, v


def _trace(f, *args):
    # abstract eval only: no Mosaic lowering, works on CPU with
    # interpret=False (recording is skipped in interpret mode, where the
    # kernel body becomes ordinary XLA ops that cost analysis counts).
    jax.make_jaxpr(f)(*args)


def test_fwd_records_two_matmul_passes():
    q, k, v = _qkv()
    unit = 2.0 * B * H * L * L * DH

    def f(q, k, v):
        return FA.flash_attend(q, k, v, interpret=False).sum()

    with FA.track_flops() as t:
        _trace(f, q, k, v)
    assert t.flops == pytest.approx(2 * unit)


def test_grad_adds_seven_backward_passes():
    q, k, v = _qkv()
    unit = 2.0 * B * H * L * L * DH

    def f(q, k, v):
        return FA.flash_attend(q, k, v, interpret=False).sum()

    with FA.track_flops() as t:
        _trace(jax.grad(f, argnums=(0, 1, 2)), q, k, v)
    assert t.flops == pytest.approx((2 + 7) * unit)


def test_causal_counts_executed_tiles_only():
    # L=512, bq=bk=128: n_q=n_k=4, executed tiles 1+2+3+4=10 of 16
    q, k, v = _qkv(l_q=512, l_k=512)

    def f(q, k, v):
        return FA.flash_attend(q, k, v, causal=True, block_q=128,
                               block_k=128, interpret=False).sum()

    with FA.track_flops() as t:
        _trace(f, q, k, v)
    unit = 2.0 * B * H * 512 * 512 * DH
    assert t.flops == pytest.approx(2 * unit * 10 / 16)


def test_interpret_mode_records_nothing():
    q, k, v = _qkv()

    def f(q, k, v):
        return FA.flash_attend(q, k, v, interpret=True).sum()

    with FA.track_flops() as t:
        _trace(f, q, k, v)
    assert t.flops == 0.0


def test_nested_trackers_and_no_leak():
    q, k, v = _qkv()

    def f(q, k, v):
        return FA.flash_attend(q, k, v, interpret=False).sum()

    with FA.track_flops() as outer:
        with FA.track_flops() as inner:
            _trace(f, q, k, v)
    assert inner.flops == outer.flops > 0
    assert not FA._FLOP_TRACKERS
    # outside any tracker: recording is a no-op
    _trace(f, q, k, v)


def test_compiled_flops_unwraps_jitted_fn():
    # an already-jitted (and traced) fn must still feed the tracker:
    # _compiled_flops retraces via __wrapped__
    from rtts.bench import _compiled_flops
    q, k, v = _qkv()

    @jax.jit
    def f(q, k, v):
        return FA.flash_attend(q, k, v, interpret=True).sum()

    f(q, k, v)  # populate the trace cache
    got = _compiled_flops(f, q, k, v)
    assert got is not None and got > 0
