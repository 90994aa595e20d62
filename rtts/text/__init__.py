from rtts.text.symbols import SYMBOLS, PAD_ID, EOS_ID, symbol_to_id, vocab_size
from rtts.text.cleaners import clean_text
from rtts.text.tokenizer import text_to_ids, ids_to_text, encode_batch

__all__ = [
    "SYMBOLS",
    "PAD_ID",
    "EOS_ID",
    "symbol_to_id",
    "vocab_size",
    "clean_text",
    "text_to_ids",
    "ids_to_text",
    "encode_batch",
]
