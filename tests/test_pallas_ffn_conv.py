"""FFN + depthwise-conv Pallas kernel equivalence (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.nn.conv import conv1d, conv1d_init
from rtts.ops.chunked_ffn import chunked_ffn_pallas, ffn_fits_vmem
from rtts.ops.depthwise_conv import depthwise_conv1d_pallas
from rtts.reversible.ffn import _ffn_body, ffn_init


def test_ffn_pallas_matches_reference():
    key = jax.random.PRNGKey(0)
    d, f = 64, 128
    params = ffn_init(key, d, f)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 64, d))
    ref = _ffn_body(params, x, "gelu")
    out = chunked_ffn_pallas(params, x, "gelu", row_block=32, interpret=True,
                             mxu_dtype="float32")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # bf16 MXU mode: same math at bf16 multiply precision
    out_bf = chunked_ffn_pallas(params, x, "gelu", row_block=32,
                                interpret=True, mxu_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_ffn_pallas_gradients_match():
    key = jax.random.PRNGKey(1)
    d, f = 32, 64
    params = ffn_init(key, d, f)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, d))

    g_ref = jax.grad(lambda p, x: jnp.sum(_ffn_body(p, x, "gelu") ** 2),
                     argnums=(0, 1))(params, x)
    g_pl = jax.grad(lambda p, x: jnp.sum(
        chunked_ffn_pallas(p, x, "gelu", row_block=16, interpret=True,
                           mxu_dtype="float32") ** 2),
        argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ffn_vmem_fallback():
    """Shapes too big for VMEM fall back to the jnp path silently."""
    assert not ffn_fits_vmem(4096, 16384, 256)
    assert ffn_fits_vmem(512, 2048, 256)
    # odd row count falls back too (still must be correct)
    key = jax.random.PRNGKey(2)
    params = ffn_init(key, 32, 64)
    x = jax.random.normal(key, (1, 13, 32))
    ref = _ffn_body(params, x, "gelu")
    out = chunked_ffn_pallas(params, x, "gelu", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("kernel", [3, 5])
def test_depthwise_pallas_matches_conv(kernel):
    key = jax.random.PRNGKey(3)
    b, l, c = 2, 32, 64
    p = conv1d_init(key, c, c, kernel, groups=c)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, l, c))
    ref = conv1d(p, x, padding="SAME", groups=c)
    out = depthwise_conv1d_pallas(x, p["w"], p["b"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_depthwise_pallas_gradients_match():
    key = jax.random.PRNGKey(4)
    b, l, c = 2, 16, 32
    p = conv1d_init(key, c, c, 3, groups=c)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, l, c))

    g_ref = jax.grad(lambda x, w, bb: jnp.sum(
        conv1d({"w": w, "b": bb}, x, padding="SAME", groups=c) ** 2),
        argnums=(0, 1, 2))(x, p["w"], p["b"])
    g_pl = jax.grad(lambda x, w, bb: jnp.sum(
        depthwise_conv1d_pallas(x, w, bb, interpret=True) ** 2),
        argnums=(0, 1, 2))(x, p["w"], p["b"])
    for a, b2 in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-4, rtol=1e-4)
