"""Spanish/French rule-based fallback G2P (VERDICT r3 missing #4 — the
reference demos fr through the espeak binary; these rules cover the
no-binary path). Spanish orthography is near-phonemic so gold is exact;
French gold tolerates the documented approximations (no liaison, schwa
handling) via PER bounds."""

import numpy as np

from naturalspeech2_tpu.utils.phonemizers.fallback import RuleBasedG2P
from naturalspeech2_tpu.utils.phonemizers.fallback_multi import (
    french_word_to_ipa,
    spanish_word_to_ipa,
)

# Latin-American Spanish gold (seseo, ll/y → ʝ, tap/trill ɾ/r)
# stress convention: ˈ before the stressed VOWEL (same nucleus-marking
# convention as arpabet_to_ipa — not before the syllable onset)
ES_GOLD = {
    "casa": "kˈasa",
    "perro": "pˈero",
    "pero": "pˈeɾo",
    "gente": "xˈente",
    "guerra": "ɡˈera",
    "queso": "kˈeso",
    "chico": "tʃˈiko",
    "llama": "ʝˈama",
    "año": "ˈaɲo",
    "ciudad": "siudˈad",  # no glide modeling: i/u stay vowels
    "hablar": "ablˈaɾ",
    "corazón": "koɾasˈon",
    "música": "mˈusika",
    "teléfono": "telˈefono",
    "jugar": "xuɡˈaɾ",
    "zapato": "sapˈato",
    "verde": "bˈeɾde",
    "examen": "eksˈamen",
    "hola": "ˈola",
    "español": "espaɲˈol",
}


def _edit(a, b):
    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return int(d[-1])


def test_spanish_words_exact_or_close():
    exact = 0
    per_num = per_den = 0
    for w, gold in ES_GOLD.items():
        hyp = spanish_word_to_ipa(w)
        exact += hyp == gold
        per_num += _edit(hyp, gold)
        per_den += len(gold)
    per = per_num / per_den
    print(f"\nSpanish: {exact}/{len(ES_GOLD)} exact, PER {per:.3f}")
    assert exact >= len(ES_GOLD) * 0.6, (exact, len(ES_GOLD))
    assert per < 0.10, per


def test_spanish_stress_rules():
    # aguda (ends in consonant ≠ n/s) → final; llana (vowel/n/s) →
    # penultimate; written accent overrides
    assert spanish_word_to_ipa("hablar") == "ablˈaɾ"
    assert spanish_word_to_ipa("casa") == "kˈasa"
    assert "ˈon" in spanish_word_to_ipa("corazón")
    assert spanish_word_to_ipa("música").startswith("mˈu")


FR_GOLD = {
    "bonjour": "bɔ̃ʒuʁ",
    "chat": "ʃa",
    "vin": "vɛ̃",
    "blanc": "blɑ̃",
    "maison": "mɛzɔ̃",
    "eau": "o",
    "nuit": "nyi",
    "rouge": "ʁuʒ",
    "gagner": "ɡaɲe",  # -er → e, approximated
    "moi": "mwa",
    "pain": "pɛ̃",
    "brun": "bʁœ̃",
    "chanson": "ʃɑ̃sɔ̃",
    "photo": "fɔto",
}


def test_french_per_bound():
    per_num = per_den = 0
    for w, gold in FR_GOLD.items():
        hyp = french_word_to_ipa(w)
        per_num += _edit(hyp, gold)
        per_den += len(gold)
    per = per_num / per_den
    print(f"\nFrench PER: {per:.3f} over {len(FR_GOLD)} words")
    assert per < 0.30, per


def test_french_nasals_and_digraphs():
    assert french_word_to_ipa("vin") == "vɛ̃"
    assert french_word_to_ipa("chanson") == "ʃɑ̃sɔ̃"
    assert "ɲ" in french_word_to_ipa("gagner")
    # nasal does NOT bind before a vowel: "ami" has no nasal
    assert "ɑ̃" not in french_word_to_ipa("ami")


def test_language_routing_through_phonemizer():
    es = RuleBasedG2P(language="es")
    fr = RuleBasedG2P(language="fr-fr")
    en = RuleBasedG2P(language="en-us")
    assert "ˈola" in es.phonemize("hola", separator="")
    assert "bɔ̃ʒuʁ" in fr.phonemize("bonjour", separator="")
    assert "h" in en.phonemize("hello", separator="")
    assert "es" in RuleBasedG2P.supported_languages()
