from rtts.attention.full import (
    attention_init,
    cross_attention,
    full_attention,
    shared_qk_self_attention,
)

__all__ = [
    "attention_init",
    "cross_attention",
    "full_attention",
    "shared_qk_self_attention",
]
