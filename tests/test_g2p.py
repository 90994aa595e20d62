"""Offline G2P: raw text -> ARPAbet -> ids -> wav, no network
(SURVEY.md §3.1 #5 "character or phoneme level")."""

import jax
import numpy as np

from rtts.text import encode_batch, frontend_vocab_size
from rtts.text.g2p import (
    LEXICON,
    letter_to_sound,
    looks_phonemized,
    text_to_phonemes,
)
from rtts.text.phonemes import PHONEME_SYMBOLS, phonemes_to_ids


def test_lexicon_words():
    out = text_to_phonemes("hello world")
    assert out == "HH AH0 L OW1 W ER1 L D"


def test_passthrough_already_phonemized():
    s = "HH AH0 L OW1 ."
    assert looks_phonemized(s)
    assert text_to_phonemes(s) == s


def test_every_lexicon_symbol_is_valid():
    valid = set(PHONEME_SYMBOLS)
    for word, pron in LEXICON.items():
        for ph in pron.split():
            assert ph in valid, f"{word}: bad phone {ph}"


def test_lts_fallback_deterministic_and_valid():
    valid = set(PHONEME_SYMBOLS)
    for w in ["zorblax", "quixotic", "brightly", "chumble", "phating"]:
        phones = letter_to_sound(w)
        assert phones == letter_to_sound(w)
        assert phones, w
        assert all(p in valid for p in phones), (w, phones)


def test_punctuation_survives():
    out = text_to_phonemes("hello, world.")
    assert "," in out.split() and "." in out.split()


def test_corpus_sentences_have_high_lexicon_coverage():
    """The synthetic corpus vocabulary is fully lexicon-covered, so the
    phoneme-level training pipeline never depends on LTS quality."""
    import re

    from rtts.data.corpus import _SENTENCES

    words = set()
    for s in _SENTENCES:
        words |= set(re.findall(r"[a-z']+", s.lower()))
    missing = sorted(w for w in words if w.strip("'") not in LEXICON)
    assert not missing, f"corpus words missing from LEXICON: {missing}"


def test_encode_batch_raw_text_phoneme_level():
    ids, mask = encode_batch(["hello world", "the quick brown fox."],
                             level="phoneme", pad_to_multiple=16)
    assert ids.shape == mask.shape and ids.shape[1] % 16 == 0
    assert (ids[mask] < frontend_vocab_size("phoneme")).all()
    # same as explicitly phonemizing first
    ref = phonemes_to_ids(text_to_phonemes("hello world"))
    np.testing.assert_array_equal(ids[0][:len(ref)], ref)


def test_raw_text_phoneme_e2e_wav():
    """Raw text -> phoneme ids -> ReformerTTS -> wav, offline."""
    from rtts.config import apply_overrides, from_dict, Config
    from rtts.infer.synthesize import Synthesizer
    from rtts.models import reformer_tts as M

    data = apply_overrides({}, [
        "dataset.text.level=phoneme", "dataset.text.pad_to_multiple=16",
        "model.d_model=32", "model.n_mels=20", "model.dec_prenet_hidden=16",
        f"model.vocab_size={frontend_vocab_size('phoneme')}",
        "model.encoder.num_layers=1", "model.encoder.d_model=32",
        "model.encoder.d_ff=64", "model.encoder.attention.num_heads=2",
        "model.encoder.attention.head_dim=16",
        "model.decoder.num_layers=1", "model.decoder.d_model=32",
        "model.decoder.d_ff=64", "model.decoder.causal=true",
        "model.decoder.attention.num_heads=2",
        "model.decoder.attention.head_dim=16",
        "model.compute_dtype=float32", "dataset.audio.n_mels=20",
    ])
    cfg = from_dict(Config, data)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    wavs = Synthesizer(cfg, params, max_frames=16)(["hello world"])
    w = np.asarray(wavs[0])
    assert w.size > 0 and np.isfinite(w).all()


def test_numbers_expand_before_g2p():
    out = text_to_phonemes("2 cats")
    toks = out.split()
    # "two" is in the lexicon: T UW1
    assert toks[:2] == ["T", "UW1"], out
