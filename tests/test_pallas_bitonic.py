"""Lanes-packed VMEM bitonic sort — correctness lock (interpret mode).

The kernel (scripts/probe_vmem_sort.py) is the surviving half of the
r5 in-VMEM fused sort+attend probe (BENCH.md r5: the fused kernel was
REJECTED, but the sort primitive ties XLA's value-sort and beats
argsort+take 2.4x standalone and is kept as evidence / a future
starting point).  This locks its semantics: a full column-wise bitonic
sort via roll-based compare-exchange, including the packed
``bucket_id * L + pos`` key trick that carries the undo permutation
through a value-only sort.
"""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")

from probe_vmem_sort import bitonic_sort_cols  # noqa: E402


def test_bitonic_sorts_columns():
    rng = np.random.default_rng(0)
    for n, c in ((64, 8), (256, 128), (1024, 16)):
        x = rng.integers(0, 1 << 20, (n, c), dtype=np.int32)
        got = np.asarray(bitonic_sort_cols(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.sort(x, axis=0))


def test_bitonic_packed_key_carries_permutation():
    # key = bucket * L + pos: sorting VALUES yields (sorted buckets,
    # stable within-bucket order) and pos = key % L is the permutation
    rng = np.random.default_rng(1)
    L, C = 128, 4
    buckets = rng.integers(0, 7, (L, C), dtype=np.int32)
    pos = np.broadcast_to(np.arange(L, dtype=np.int32)[:, None], (L, C))
    packed = buckets * L + pos
    got = np.asarray(bitonic_sort_cols(jnp.asarray(packed), interpret=True))
    got_pos = got % L
    got_buckets = got // L
    for c in range(C):
        order = np.argsort(buckets[:, c], kind="stable")
        np.testing.assert_array_equal(got_pos[:, c], order)
        np.testing.assert_array_equal(got_buckets[:, c],
                                      np.sort(buckets[:, c]))


def test_bitonic_handles_duplicates_and_extremes():
    x = np.array([[5, 0], [5, -(1 << 30)], [0, 1 << 30], [5, 0]],
                 dtype=np.int32)
    # pad to power-of-two length 4 (already) — sort both columns
    got = np.asarray(bitonic_sort_cols(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.sort(x, axis=0))
