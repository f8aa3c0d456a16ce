"""Text frontend tests: cleaner/expanders, punctuation restore, fallback
G2P, tokenizer round-trips (reference __main__ smoke-block semantics)."""

import numpy as np
import pytest

from naturalspeech2_tpu.utils.cleaner import TextProcessor
from naturalspeech2_tpu.utils.expand.abbreviations import AbbreviationExpander
from naturalspeech2_tpu.utils.expand.number_norm import (
    NumberNormalizer,
    number_to_words_en,
)
from naturalspeech2_tpu.utils.expand.time_norm import TimeExpander
from naturalspeech2_tpu.utils.phonemizers.fallback import RuleBasedG2P
from naturalspeech2_tpu.utils.phonemizers.punctuation import Punctuation
from naturalspeech2_tpu.utils.tokenizer import DEFAULT_PHONEMES, Tokenizer


def test_number_to_words():
    assert number_to_words_en(0) == "zero"
    assert number_to_words_en(13) == "thirteen"
    assert number_to_words_en(30) == "thirty"
    assert number_to_words_en(42) == "forty-two"
    assert number_to_words_en(100) == "one hundred"
    assert number_to_words_en(1000) == "one thousand"
    assert number_to_words_en(1234) == "one thousand two hundred thirty-four"
    assert number_to_words_en(-5) == "minus five"


def test_number_normalizer_currency_and_years():
    n = NumberNormalizer()
    n.add_currency("$", {0.01: "cent", 0.02: "cents", 1: "dollar", 2: "dollars"})
    out = n.normalize_numbers("I have $1,000 and 5 apples.", language="en")
    assert "one thousand dollars" in out
    assert "five apples" in out
    assert "2005" not in n.normalize_numbers("in 2005", language="en")
    assert "two thousand five" in n.normalize_numbers("in 2005", language="en")
    assert "nineteen hundred" in n.normalize_numbers("in 1900", language="en")


def test_time_expander():
    t = TimeExpander()
    out = t.expand_time("this is 9:30 am", language="en")
    assert "nine thirty a m" in out
    out2 = t.expand_time("at 12:05 pm sharp", language="en")
    assert "twelve oh five p m" in out2
    assert t.expand_time("no time here", language="en") == "no time here"


def test_abbreviation_expander():
    a = AbbreviationExpander()
    out = a.replace_text_abbreviations("Hello, Mr. Example from Intl. Corp.", "en")
    assert "mister" in out
    assert "international" in out
    # unknown language passes through
    assert a.replace_text_abbreviations("Mr. X", "zz") == "Mr. X"


def test_cleaner_pipeline():
    tp = TextProcessor()
    out = tp.phoneme_cleaners(
        "Hello, Mr. Example, this is 9:30 am and  my number is 30.", language="en"
    )
    assert "mister" in out
    assert "nine thirty a m" in out
    assert "thirty" in out
    assert "  " not in out
    assert "<" not in tp.phoneme_cleaners("a <b> c", language="en")


def test_punctuation_strip_and_restore():
    p = Punctuation()
    assert p.strip("This is. example !") == "This is example"
    segments, marks = p.strip_to_restore("This is. example !")
    assert segments == ["This is", "example"]
    restored = Punctuation.restore(segments, marks)
    assert "".join(restored) == "This is. example !"


def test_fallback_g2p():
    g2p = RuleBasedG2P()
    out = g2p.phonemize("hello world", separator="")
    assert "həloʊ" in out and "wɜːld" in out
    out2 = g2p.phonemize("checking things", separator="")
    assert "tʃ" in out2 and "ŋ" in out2  # digraph rules applied


def test_tokenizer_round_trip():
    tok = Tokenizer()
    ids, cleaned, phonemes = tok.text_to_ids("Hello, Mr. Example, this is 9:30 am.")
    assert len(ids) > 0
    assert "mister" in cleaned
    assert all(0 <= i < tok.vocab_size for i in ids)
    # decode inverts encode for in-vocab chars
    assert tok.decode(tok.encode("həloʊ")) == "həloʊ"


def test_tokenizer_batch_padding():
    tok = Tokenizer()
    batch = tok.texts_to_tensor_ids(["hello world", "hi"])
    assert batch.ndim == 2 and batch.shape[0] == 2
    assert batch.dtype == np.int32
    assert (batch[1] == -1).any()  # padded with pad_id


def test_tokenizer_blank_and_bos_eos():
    tok = Tokenizer(add_blank=True, use_eos_bos=True)
    ids, _, _ = tok.text_to_ids("hi")
    assert ids[0] == tok.bos_id
    assert ids[-1] == tok.eos_id
    assert tok.blank_id in ids


def test_tokenizer_unknown_dropped():
    tok = Tokenizer()
    ids = tok.encode("h💙i")
    assert len(ids) == 2
    assert "💙" in tok.not_found_characters


def test_vocab_is_reference_size():
    assert len(DEFAULT_PHONEMES) == 122


def test_number_to_words_fr():
    from naturalspeech2_tpu.utils.expand.number_norm import number_to_words_fr

    assert number_to_words_fr(21) == "vingt et un"
    assert number_to_words_fr(71) == "soixante et onze"
    assert number_to_words_fr(80) == "quatre-vingts"
    assert number_to_words_fr(99) == "quatre-vingt-dix-neuf"
    assert number_to_words_fr(100) == "cent"
    assert number_to_words_fr(200) == "deux cents"
    assert number_to_words_fr(1000) == "mille"
    assert number_to_words_fr(1500) == "mille cinq cents"


def test_number_to_words_es():
    from naturalspeech2_tpu.utils.expand.number_norm import number_to_words_es

    assert number_to_words_es(21) == "veintiuno"
    assert number_to_words_es(31) == "treinta y uno"
    assert number_to_words_es(100) == "cien"
    assert number_to_words_es(101) == "ciento uno"
    assert number_to_words_es(500) == "quinientos"
    assert number_to_words_es(1000) == "mil"
    assert number_to_words_es(2024) == "dos mil veinticuatro"


def test_normalizer_multilang():
    n = NumberNormalizer()
    assert "treinta" in n.normalize_numbers("Tengo 30 manzanas", language="es")
    assert "trente" in n.normalize_numbers("J'ai 30 pommes", language="fr")
