"""VERDICT r4 #5 probe: can an in-VMEM fused sort(+attend) beat the
shipped XLA argsort + one-hot-matmul permutation at 8k-frame LSH?

The shipped LSH core (rtts/attention/lsh.py) sorts bucket keys with two
XLA argsorts (~2.2 ms at 8k, BENCH.md r3) and permutes qk+v rows with a
one-hot MXU matmul (~2.1 ms fwd+bwd, BENCH.md r4 "gather fusion") — both
round-trip HBM.  A fused kernel would need two primitives to win:

  A. an in-VMEM bitonic sort of the packed bucket keys
     (key = bucket_id * L + pos packs sort key and undo index into one
     int32, so sorting VALUES is the whole job — no payload moves).
     Lanes-packed: column c of the (L, 128) block is an independent
     (batch*head) slice's key vector, so ONE kernel sorts up to 128
     head-slices with L-row VPU ops.  Compare-exchange partner i^j is
     reachable with pltpu.roll(±j) because j is a power of two
     (i^j = i+j when bit j of i is clear, i-j when set — never wraps).

  B. a per-row dynamic-index VMEM gather (the "attend reads sorted rows
     in place" step) — out[i] = x[idx[i]] with x resident in VMEM.
     If this is slower per row than the one-hot matmul's effective rate,
     the fused attend cannot pay for itself no matter how fast the sort.

This script measures both primitives standalone (same-process A/B vs
their XLA equivalents) and prints a verdict.  --check runs interpret-mode
correctness on CPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_vmem_sort.py
     python scripts/probe_vmem_sort.py --check   (CPU, interpret mode)
"""

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


# ---------------------------------------------------------------- kernel A --
def _bitonic_kernel(x_ref, o_ref, *, n):
    """Full bitonic sort of each COLUMN of an (n, C) int32 block, entirely
    in VMEM: log2(n)*(log2(n)+1)/2 compare-exchange passes, each a
    roll + compare + two selects over the block."""
    x = x_ref[...]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    stages = int(np.log2(n))
    for s in range(1, stages + 1):
        k = 1 << s
        for t in range(s - 1, -1, -1):
            j = 1 << t
            lower = (iota & j) == 0
            up = (iota & k) == 0
            pv = jnp.where(lower, pltpu.roll(x, n - j, axis=0),
                           pltpu.roll(x, j, axis=0))
            # roll(x, n-j) shifts DOWN by j (value from row i+j lands at
            # i); roll(x, j) shifts UP by j (value from i-j)
            take_min = up == lower
            x = jnp.where(take_min, jnp.minimum(x, pv), jnp.maximum(x, pv))
    o_ref[...] = x


def bitonic_sort_cols(x, interpret=False):
    """Sort each column of (n, C) int32 ascending, one fused kernel."""
    n, c = x.shape
    assert n & (n - 1) == 0, "bitonic needs a power-of-two length"
    # the unrolled compare-exchange chain needs > the default 16M scoped
    # VMEM at L=4096 (measured: 23.05M requested) — raise the cap
    kwargs = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)}
    return pl.pallas_call(
        functools.partial(_bitonic_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(x)


# ---------------------------------------------------------------- kernel B --
def _row_gather_kernel(idx_ref, x_ref, o_ref, *, rows):
    def body(i, _):
        k = idx_ref[i]
        o_ref[i, :] = x_ref[k, :]
        return 0

    jax.lax.fori_loop(0, rows, body, 0)


def vmem_row_gather(x, idx, interpret=False):
    """out[i] = x[idx[i]] with x fully VMEM-resident; per-row dynamic
    indexing (the access pattern a fused sorted-attend would need)."""
    rows, d = x.shape
    return pl.pallas_call(
        functools.partial(_row_gather_kernel, rows=rows),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx, x)


# ------------------------------------------------------------------ checks --
def check():
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    for n, c in ((64, 8), (256, 128)):
        x = rng.integers(0, 1 << 20, (n, c), dtype=np.int32)
        got = np.asarray(bitonic_sort_cols(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.sort(x, axis=0))
    x = rng.standard_normal((128, 128)).astype(np.float32)
    idx = rng.permutation(128).astype(np.int32)
    got = np.asarray(vmem_row_gather(jnp.asarray(x), jnp.asarray(idx),
                                     interpret=True))
    np.testing.assert_array_equal(got, x[idx])
    print("interpret-mode checks OK")


# ------------------------------------------------------------------- bench --
def bench():
    from rtts.bench import _time_loop

    print(f"devices: {jax.devices()}", flush=True)
    L, C = 4096, 128          # 8k frames r2 -> 4096 groups; 128 lane slices
    rng = jax.random.PRNGKey(0)
    keys = jax.random.randint(rng, (L, C), 0, 1 << 20, jnp.int32)

    # A: fused VMEM bitonic vs XLA argsort-based sort (the shipped path
    # sorts via argsort to ALSO get the permutation; value-sort alone is
    # the kernel's best case)
    dt_k = _time_loop(lambda v: bitonic_sort_cols(v), keys,
                      iters=8, repeats=5)
    dt_x = _time_loop(lambda v: jnp.sort(v, axis=0), keys,
                      iters=8, repeats=5)
    dt_a = _time_loop(
        lambda v: jnp.take_along_axis(v, jnp.argsort(v, axis=0), axis=0),
        keys, iters=8, repeats=5)
    print(f"A. sort (L={L}, {C} slices): VMEM bitonic {dt_k*1e3:.3f} ms | "
          f"XLA sort {dt_x*1e3:.3f} ms | XLA argsort+take {dt_a*1e3:.3f} ms",
          flush=True)

    # B: per-row dynamic VMEM gather vs one-hot MXU permutation at the
    # LSH shapes (rows = n_groups, d = packed qk+v width)
    for d in (128, 256):
        x = jax.random.normal(jax.random.PRNGKey(1), (L, d), jnp.float32)
        idx = jax.random.permutation(jax.random.PRNGKey(2), L
                                     ).astype(jnp.int32)

        dt_g = _time_loop(lambda v, ii: vmem_row_gather(v, ii), x, (idx,),
                          iters=4, repeats=5)

        def onehot(v, ii):
            oh = jax.nn.one_hot(ii, L, dtype=jnp.bfloat16)
            return jnp.dot(oh, v.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        dt_o = _time_loop(onehot, x, (idx,), iters=4, repeats=5)
        dt_t = _time_loop(lambda v, ii: jnp.take(v, ii, axis=0), x, (idx,),
                          iters=4, repeats=5)
        print(f"B. row gather (L={L}, d={d}): VMEM loop {dt_g*1e3:.3f} ms "
              f"({L/dt_g/1e6:.1f} Mrows/s) | one-hot MXU {dt_o*1e3:.3f} ms | "
              f"XLA take {dt_t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        check()
    else:
        bench()
