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
    # without am/pm the trailing space must survive (a greedy \s* outside
    # the optional group used to glue the time to the next word)
    assert (
        t.expand_time("Meet at 5:30 tomorrow", language="en")
        == "Meet at five thirty tomorrow"
    )


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
    assert "həˈloʊ" in out and "wɜːɹld" in out
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


# ----------------------- espeak wrapper (mocked binary) ----------------- #


def _fake_espeak(tmp_path, name, version_line, voices=None, phon_out="_h_ə_l_ˈoʊ"):
    """Install a fake espeak binary on PATH emitting canned output."""
    voices = voices or [
        "Pty Language Age/Gender VoiceName          File          Other Languages",
        " 5  en-us          M  english-us     en-us          (en 3)",
        " 5  fr             M  french         fr",
        " 7  cmn            M  chinese        zh",
    ]
    script = tmp_path / name
    lines = [
        "#!/bin/sh",
        'for a in "$@"; do',
        '  case "$a" in',
        f'    --version) echo "{version_line}"; exit 0;;',
        "    --voices) cat << 'VOICES'",
        *voices,
        "VOICES",
        "    exit 0;;",
        "  esac",
        "done",
        f'echo "{phon_out}"',
    ]
    script.write_text("\n".join(lines) + "\n")
    script.chmod(0o755)
    return script


def test_espeak_ng_version_parsing(tmp_path, monkeypatch):
    from naturalspeech2_tpu.utils.phonemizers import espeak_wrapper as ew

    _fake_espeak(
        tmp_path, "espeak-ng",
        "eSpeak NG text-to-speech: 1.52.0  Data at: /usr/share/espeak-ng-data",
    )
    monkeypatch.setenv("PATH", f"{tmp_path}:/usr/bin:/bin")
    ew.ESpeak._LANG_CACHE.clear()
    e = ew.ESpeak("en")
    assert e.backend == "espeak-ng"
    assert e.version() == "1.52.0"
    assert e.language == "en-us"  # band-aid remap


def test_espeak_symlinked_version_regex(tmp_path, monkeypatch):
    """A classic `espeak` symlinked to espeak-ng moves the version token;
    the regex on 'text-to-speech: X.Y.Z' still finds it (ref :20-29)."""
    from naturalspeech2_tpu.utils.phonemizers import espeak_wrapper as ew

    _fake_espeak(
        tmp_path, "espeak",
        "eSpeak NG text-to-speech: 1.50  Data at: /usr/share",
    )
    monkeypatch.setenv("PATH", f"{tmp_path}:/usr/bin:/bin")
    ew.ESpeak._LANG_CACHE.clear()
    e = ew.ESpeak("en", backend="espeak")
    assert e.version() == "1.50"
    # ≥1.48.15 → --ipa=1 (non-tie)
    assert e._ipa_flag(tie=False) == "--ipa=1"
    assert e._ipa_flag(tie=True) == "--ipa=1"


def test_espeak_old_version_ipa_gate(tmp_path, monkeypatch):
    from naturalspeech2_tpu.utils.phonemizers import espeak_wrapper as ew

    _fake_espeak(
        tmp_path, "espeak",
        "eSpeak text-to-speech: 1.48.03  04.Mar.14  Data at: /usr/share",
    )
    monkeypatch.setenv("PATH", f"{tmp_path}:/usr/bin:/bin")
    ew.ESpeak._LANG_CACHE.clear()
    e = ew.ESpeak("en", backend="espeak")
    assert e.version() == "1.48.03"
    assert e._ipa_flag(tie=False) == "--ipa=3"  # pre-1.48.15


def test_espeak_language_validation(tmp_path, monkeypatch):
    from naturalspeech2_tpu.utils.phonemizers import espeak_wrapper as ew

    _fake_espeak(
        tmp_path, "espeak-ng",
        "eSpeak NG text-to-speech: 1.52.0  Data at: /x",
    )
    monkeypatch.setenv("PATH", f"{tmp_path}:/usr/bin:/bin")
    ew.ESpeak._LANG_CACHE.clear()
    assert ew.ESpeak("fr").language == "fr"
    assert ew.ESpeak("zh-cn").language == "cmn"  # remap then validate
    with pytest.raises(RuntimeError, match="not supported"):
        ew.ESpeak("xx-nope")


def test_espeak_unknown_backend_rejected(tmp_path, monkeypatch):
    from naturalspeech2_tpu.utils.phonemizers import espeak_wrapper as ew

    _fake_espeak(
        tmp_path, "espeak-ng",
        "eSpeak NG text-to-speech: 1.52.0  Data at: /x",
    )
    monkeypatch.setenv("PATH", f"{tmp_path}:/usr/bin:/bin")
    with pytest.raises(ValueError, match="unknown espeak backend"):
        ew.ESpeak("en", backend="festival")


def test_espeak_phonemize_cleanup(tmp_path, monkeypatch):
    """Leading separator stripped, (lang) switch flags removed, '_' →
    separator."""
    from naturalspeech2_tpu.utils.phonemizers import espeak_wrapper as ew

    _fake_espeak(
        tmp_path, "espeak-ng",
        "eSpeak NG text-to-speech: 1.52.0  Data at: /x",
        phon_out="_h_ə_l_ˈoʊ (en)wˈɜːld(fr)",
    )
    monkeypatch.setenv("PATH", f"{tmp_path}:/usr/bin:/bin")
    ew.ESpeak._LANG_CACHE.clear()
    e = ew.ESpeak("en")
    out = e.phonemize_espeak("hello world", separator="|")
    assert out.startswith("h"), out  # leading _ stripped
    assert "(en)" not in out and "(fr)" not in out
    assert "|" in out


# ----------------------- fallback G2P quality --------------------------- #


def test_fallback_lexicon_coverage():
    from naturalspeech2_tpu.utils.phonemizers.fallback import word_to_ipa

    assert word_to_ipa("hello") == "həˈloʊ"
    assert word_to_ipa("twenty") == "ˈtwɛnti"
    assert word_to_ipa("hundred") == "ˈhʌndɹəd"
    # number-normalizer output words must all be in the lexicon
    for w in ("zero one two three four five six seven eight nine ten eleven "
              "twelve thirteen twenty thirty forty fifty sixty seventy "
              "eighty ninety hundred thousand million dollars cents").split():
        out = word_to_ipa(w)
        assert out and out != w, w


def test_fallback_suffix_morphology():
    from naturalspeech2_tpu.utils.phonemizers.fallback import word_to_ipa

    assert word_to_ipa("worked") == word_to_ipa("work") + "t"   # voiceless -ed
    assert word_to_ipa("played") == word_to_ipa("play") + "d"   # voiced -ed
    assert word_to_ipa("wanted").endswith("ɪd")                  # t/d stem
    assert word_to_ipa("books") == word_to_ipa("book") + "s"    # voiceless -s
    assert word_to_ipa("dogs") == word_to_ipa("dog") + "z"      # voiced -s
    assert word_to_ipa("walking") == word_to_ipa("walk") + "ɪŋ"
    assert word_to_ipa("nicely") == word_to_ipa("nice") + "li"


def test_fallback_magic_e():
    from naturalspeech2_tpu.utils.phonemizers.fallback import word_to_ipa

    # not in lexicon → LTS with magic-e lengthening
    assert "eɪ" in word_to_ipa("crate")
    assert "aɪ" in word_to_ipa("stripe")
    assert "oʊ" in word_to_ipa("globe")


def test_fallback_outputs_tokenizer_vocab():
    """Everything the fallback emits must survive the tokenizer (no unknown
    char drops) for common sentences."""
    from naturalspeech2_tpu.utils.phonemizers.fallback import RuleBasedG2P
    from naturalspeech2_tpu.utils.tokenizer import Tokenizer

    g2p = RuleBasedG2P(keep_puncs=False)
    tok = Tokenizer()
    phonemes = g2p.phonemize(
        "the quick brown fox jumps over the lazy dog at twenty five past"
        " nine", separator=""
    )
    ids = tok.encode(phonemes)
    decoded = tok.decode(ids)
    assert decoded == phonemes, (phonemes, decoded)
