from rtts.infer.decode import (
    DecodeResult,
    decode_greedy,
    decode_greedy_recompute,
    decode_teacher_check,
)
from rtts.infer.serving import ServingEngine, serve_batch, serve_pool
from rtts.infer.streaming import StreamingSynthesizer
from rtts.infer.synthesize import synthesize, Synthesizer

__all__ = [
    "DecodeResult",
    "decode_greedy",
    "decode_greedy_recompute",
    "decode_teacher_check",
    "synthesize",
    "Synthesizer",
    "StreamingSynthesizer",
    "ServingEngine",
    "serve_batch",
    "serve_pool",
]
