from rtts.reversible.ffn import ffn_init, chunked_ffn
from rtts.reversible.rev import reversible_sequence

__all__ = ["ffn_init", "chunked_ffn", "reversible_sequence"]
