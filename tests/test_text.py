import numpy as np

from rtts.text import (
    EOS_ID,
    PAD_ID,
    clean_text,
    encode_batch,
    ids_to_text,
    text_to_ids,
    vocab_size,
)
from rtts.text.cleaners import expand_numbers


def test_clean_english_numbers_and_abbrev():
    assert clean_text("Dr. Smith has 21 cats.") == "doctor smith has twenty one cats."
    assert clean_text("Mr.  Jones,   hello!") == "mister jones, hello!"


def test_expand_numbers_variants():
    assert expand_numbers("1,234") == "one thousand two hundred thirty four"
    assert expand_numbers("3.14") == "three point one four"
    assert expand_numbers("100") == "one hundred"
    assert expand_numbers("0") == "zero"


def test_round_trip_tokenize():
    s = "hello world, test."
    ids = text_to_ids(s, cleaner="basic")
    assert ids[-1] == EOS_ID
    assert ids_to_text(ids) == s


def test_encode_batch_shapes_and_padding():
    ids, mask = encode_batch(["hi", "a longer sentence here"], pad_to_multiple=16)
    assert ids.shape == mask.shape
    assert ids.shape[1] % 16 == 0
    assert ids.dtype == np.int32
    # row 0: "hi" + eos = 3 real tokens
    assert mask[0].sum() == 3
    assert (ids[0][~mask[0]] == PAD_ID).all()
    # eos present at end of each real region
    assert ids[0][mask[0].sum() - 1] == EOS_ID


def test_encode_batch_truncation_keeps_eos():
    long = "a" * 100
    ids, mask = encode_batch([long], pad_to_multiple=16, max_len=32)
    assert ids.shape[1] == 32
    assert ids[0, 31] == EOS_ID


def test_vocab_covers_cleaned_text():
    from rtts.text.symbols import UNK_ID

    cleaned = clean_text("The quick brown fox; it's 9 o'clock (now)!?")
    ids = text_to_ids(cleaned, cleaner="identity", append_eos=False)
    assert UNK_ID not in ids
    assert vocab_size() > 50
