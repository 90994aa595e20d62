"""Phoneme-level frontend (SURVEY.md §3.1 #5: char OR phoneme level)."""

import numpy as np

from rtts.text import (
    frontend_vocab_size,
    ids_to_phonemes,
    phoneme_vocab_size,
    phonemes_to_ids,
    encode_batch,
)
from rtts.text.phonemes import EOS_ID, PAD_ID, UNK_ID


def test_round_trip():
    s = "HH AH0 L OW1 . W ER1 L D"
    ids = phonemes_to_ids(s)
    assert ids[-1] == EOS_ID
    assert ids_to_phonemes(ids) == s


def test_stress_variants_and_unknowns():
    ids = phonemes_to_ids("AA0 AA1 AA2", append_eos=False)
    # three distinct vowel ids separated by the space symbol
    phones = [i for i in ids if i > 2]
    assert len(set(phones)) >= 3
    assert UNK_ID in phonemes_to_ids("QQQ", append_eos=False)
    # lowercase input accepted
    assert phonemes_to_ids("hh ah0") == phonemes_to_ids("HH AH0")


def test_encode_batch_phoneme_level():
    ids, mask = encode_batch(["HH AH0 L OW1", "K AE1 T"],
                             pad_to_multiple=16, level="phoneme")
    assert ids.shape == mask.shape
    assert ids.shape[1] % 16 == 0
    assert ids.dtype == np.int32
    assert (ids[0][~mask[0]] == PAD_ID).all()


def test_vocab_sizes():
    assert frontend_vocab_size("phoneme") == phoneme_vocab_size()
    assert frontend_vocab_size("char") != phoneme_vocab_size()
    assert phoneme_vocab_size() > 60  # 24 consonants + 45 vowels + punct
