"""Pure-Python rule-based English G2P fallback (host-side).

The reference delegates G2P entirely to the external espeak binary
(`espeak_wrapper.py`); when no such binary exists on the host, this module
provides an approximate English grapheme→IPA conversion (common-word lexicon
+ digraph/letter-to-sound rules) so the full text→audio pipeline remains
functional. Output is restricted to the tokenizer's IPA vocabulary. For
production-quality phonemization, install espeak-ng.
"""

from __future__ import annotations

import re
from typing import Dict

from naturalspeech2_tpu.utils.phonemizers.base import BasePhonemizer
from naturalspeech2_tpu.utils.phonemizers.punctuation import Punctuation

# small lexicon of very common English words (GenAm IPA)
_LEXICON: Dict[str, str] = {
    "a": "ə", "an": "ən", "the": "ðə", "i": "aɪ", "you": "juː", "he": "hiː",
    "she": "ʃiː", "we": "wiː", "they": "ðeɪ", "it": "ɪt", "is": "ɪz",
    "are": "ɑːɹ", "was": "wʌz", "were": "wɜː", "be": "biː", "been": "bɪn",
    "have": "hæv", "has": "hæz", "had": "hæd", "do": "duː", "does": "dʌz",
    "did": "dɪd", "will": "wɪl", "would": "wʊd", "can": "kæn", "could": "kʊd",
    "should": "ʃʊd", "to": "tuː", "of": "ʌv", "in": "ɪn", "on": "ɒn",
    "at": "æt", "by": "baɪ", "for": "fɔːɹ", "with": "wɪð", "from": "fɹʌm",
    "and": "ænd", "or": "ɔːɹ", "not": "nɒt", "no": "noʊ", "yes": "jɛs",
    "this": "ðɪs", "that": "ðæt", "these": "ðiːz", "those": "ðoʊz",
    "what": "wʌt", "who": "huː", "how": "haʊ", "when": "wɛn", "where": "wɛəɹ",
    "why": "waɪ", "there": "ðɛəɹ", "here": "hɪəɹ", "one": "wʌn", "two": "tuː",
    "three": "θɹiː", "four": "fɔːɹ", "five": "faɪv", "six": "sɪks",
    "seven": "sɛvən", "eight": "eɪt", "nine": "naɪn", "ten": "tɛn",
    "hello": "həloʊ", "world": "wɜːld", "mister": "mɪstəɹ",
    "speech": "spiːtʃ", "time": "taɪm", "people": "piːpəl", "good": "ɡʊd",
    "day": "deɪ", "night": "naɪt", "name": "neɪm", "my": "maɪ", "your": "jɔːɹ",
    "all": "ɔːl", "some": "sʌm", "very": "vɛɹi", "new": "nuː", "now": "naʊ",
}

# ordered grapheme → IPA rules (longest-match first)
_RULES = [
    ("tion", "ʃən"), ("sion", "ʒən"), ("ough", "ʌf"), ("augh", "ɔː"),
    ("eigh", "eɪ"), ("igh", "aɪ"), ("tch", "tʃ"), ("dge", "dʒ"),
    ("ch", "tʃ"), ("sh", "ʃ"), ("th", "θ"), ("ph", "f"), ("wh", "w"),
    ("ng", "ŋ"), ("ck", "k"), ("qu", "kw"), ("oo", "uː"), ("ee", "iː"),
    ("ea", "iː"), ("ou", "aʊ"), ("ow", "aʊ"), ("oi", "ɔɪ"), ("oy", "ɔɪ"),
    ("ai", "eɪ"), ("ay", "eɪ"), ("au", "ɔː"), ("aw", "ɔː"), ("ar", "ɑːɹ"),
    ("er", "əɹ"), ("ir", "ɜːɹ"), ("or", "ɔːɹ"), ("ur", "ɜːɹ"),
    ("a", "æ"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "ɛ"), ("f", "f"),
    ("g", "ɡ"), ("h", "h"), ("i", "ɪ"), ("j", "dʒ"), ("k", "k"), ("l", "l"),
    ("m", "m"), ("n", "n"), ("o", "ɒ"), ("p", "p"), ("r", "ɹ"), ("s", "s"),
    ("t", "t"), ("u", "ʌ"), ("v", "v"), ("w", "w"), ("x", "ks"), ("y", "j"),
    ("z", "z"),
]


def word_to_ipa(word: str) -> str:
    word = word.lower()
    if word in _LEXICON:
        return _LEXICON[word]
    # silent trailing e heuristic: "make" → "maek"-style long vowel
    out = []
    i = 0
    w = word
    if len(w) > 2 and w.endswith("e") and w[-2] not in "aeiou":
        w = w[:-1]
    while i < len(w):
        for pat, ipa in _RULES:
            if w.startswith(pat, i):
                out.append(ipa)
                i += len(pat)
                break
        else:
            i += 1  # unknown char: drop
    return "".join(out)


class RuleBasedG2P(BasePhonemizer):
    """Approximate English G2P; drop-in for `ESpeak` when no binary exists."""

    def __init__(
        self,
        language: str = "en-us",
        punctuations: str = Punctuation.default_puncs(),
        keep_puncs: bool = True,
    ):
        super().__init__(language, punctuations=punctuations, keep_puncs=keep_puncs)

    @staticmethod
    def name() -> str:
        return "rule_based_en"

    @classmethod
    def is_available(cls) -> bool:
        return True

    @classmethod
    def version(cls) -> str:
        return "1.0"

    @staticmethod
    def supported_languages() -> dict:
        return {"en": "English", "en-us": "English (America)"}

    def is_supported_language(self, language: str) -> bool:
        return True  # approximate output for any latin-script input

    def _phonemize(self, text: str, separator: str = "") -> str:
        words = re.findall(r"[A-Za-z']+", text)
        sep = separator or ""
        return " ".join(sep.join(word_to_ipa(w)) if sep else word_to_ipa(w)
                        for w in words)


def default_phonemizer(language: str = "en-us", **kwargs):
    """ESpeak when installed, rule-based fallback otherwise."""
    from naturalspeech2_tpu.utils.phonemizers.espeak_wrapper import ESpeak

    if ESpeak.is_available():
        return ESpeak(language, **kwargs)
    return RuleBasedG2P(language, **kwargs)
