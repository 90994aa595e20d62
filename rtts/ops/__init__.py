"""Pallas TPU kernels for the hot ops (SURVEY.md §3.3 row 1, [BL] north
star): the LSH chunk-attend stage, the chunked feed-forward, and the
SqueezeWave depthwise conv.  Every kernel has a jnp reference
implementation as its equivalence oracle and gradient path, and an
``interpret=True`` mode so tests run on CPU."""

from rtts.ops.lsh_attention import lsh_attend_chunks_pallas

__all__ = ["lsh_attend_chunks_pallas"]
