"""Wide G2P fallback evaluation (VERDICT r3 #9): ~230 gold words across
9 orthographic categories, with stress-placement accuracy.

Gold comes from embedded CMUdict-format ARPABET entries converted through
`arpabet_to_ipa` (itself unit-tested in test_g2p_accuracy.py), so gold and
hypothesis share one IPA convention instead of hand-written IPA drifting.

Reported per category (see PARITY.md for the recorded numbers):
- built-in-lexicon hit rate;
- PER (stress-stripped char Levenshtein / gold length) on lexicon hits —
  agreement of the embedded 527-word lexicon with CMUdict;
- PER on LTS-judged words (not in the lexicon) — the rule quality;
- stress accuracy on lexicon hits: index of the primary-stressed vowel
  (counting vowels before ˈ — robust to onset-vs-nucleus mark placement).
"""

import numpy as np
import pytest

from naturalspeech2_tpu.utils.phonemizers.fallback import (
    _LEXICON,
    arpabet_to_ipa,
    word_to_ipa,
)

# CMUdict-format gold (word -> ARPABET with stress digits), by category.
GOLD_ARPA = {
    "clusters": {
        "street": "S T R IY1 T", "spring": "S P R IH1 NG",
        "throne": "TH R OW1 N", "shrimp": "SH R IH1 M P",
        "branch": "B R AE1 N CH", "glimpse": "G L IH1 M P S",
        "scratch": "S K R AE1 CH", "splash": "S P L AE1 SH",
        "script": "S K R IH1 P T", "crunch": "K R AH1 N CH",
        "plunge": "P L AH1 N JH", "drift": "D R IH1 F T",
        "grasp": "G R AE1 S P", "blend": "B L EH1 N D",
        "cliff": "K L IH1 F", "sketch": "S K EH1 CH",
        "strength": "S T R EH1 NG K TH", "twelfth": "T W EH1 L F TH",
    },
    "silent_letters": {
        "knack": "N AE1 K", "gnome": "N OW1 M", "wrist": "R IH1 S T",
        "knight": "N AY1 T", "wretch": "R EH1 CH", "psalm": "S AA1 M",
        "island": "AY1 L AH0 N D", "answer": "AE1 N S ER0",
        "sword": "S AO1 R D", "half": "HH AE1 F", "calm": "K AA1 M",
        "iron": "AY1 ER0 N", "thumb": "TH AH1 M", "comb": "K OW1 M",
    },
    "silent_e": {
        "plate": "P L EY1 T", "snake": "S N EY1 K", "theme": "TH IY1 M",
        "scheme": "S K IY1 M", "pride": "P R AY1 D",
        "stripe": "S T R AY1 P", "globe": "G L OW1 B",
        "quote": "K W OW1 T", "flute": "F L UW1 T", "cube": "K Y UW1 B",
        "crane": "K R EY1 N", "slope": "S L OW1 P", "prune": "P R UW1 N",
        "spine": "S P AY1 N", "shade": "SH EY1 D",
    },
    "vowel_teams": {
        "beach": "B IY1 CH", "dream": "D R IY1 M", "speech": "S P IY1 CH",
        "grief": "G R IY1 F", "shield": "SH IY1 L D", "toast": "T OW1 S T",
        "groan": "G R OW1 N", "crawl": "K R AO1 L", "haunt": "HH AO1 N T",
        "spoil": "S P OY1 L", "mouth": "M AW1 TH", "crowd": "K R AW1 D",
        "proud": "P R AW1 D", "weight": "W EY1 T", "stray": "S T R EY1",
        "shout": "SH AW1 T", "niece": "N IY1 S", "yield": "Y IY1 L D",
    },
    "r_colored": {
        "charm": "CH AA1 R M", "sharp": "SH AA1 R P",
        "storm": "S T AO1 R M", "force": "F AO1 R S",
        "swirl": "S W ER1 L", "nurse": "N ER1 S", "pearl": "P ER1 L",
        "square": "S K W EH1 R", "spare": "S P EH1 R",
        "stairs": "S T EH1 R Z", "fierce": "F IH1 R S",
        "cheer": "CH IH1 R", "smear": "S M IH1 R", "court": "K AO1 R T",
    },
    "two_syl_initial_stress": {
        "table": "T EY1 B AH0 L", "humble": "HH AH1 M B AH0 L",
        "jungle": "JH AH1 NG G AH0 L", "purple": "P ER1 P AH0 L",
        "simple": "S IH1 M P AH0 L", "magnet": "M AE1 G N AH0 T",
        "public": "P AH1 B L IH0 K", "temper": "T EH1 M P ER0",
        "tender": "T EH1 N D ER0", "velvet": "V EH1 L V AH0 T",
        "wisdom": "W IH1 Z D AH0 M", "doctor": "D AA1 K T ER0",
        "fabric": "F AE1 B R IH0 K", "harvest": "HH AA1 R V AH0 S T",
        "kitten": "K IH1 T AH0 N", "lumber": "L AH1 M B ER0",
        "pattern": "P AE1 T ER0 N", "pencil": "P EH1 N S AH0 L",
        "pepper": "P EH1 P ER0", "picture": "P IH1 K CH ER0",
        "plastic": "P L AE1 S T IH0 K", "pumpkin": "P AH1 M P K IH0 N",
        "ribbon": "R IH1 B AH0 N", "rocket": "R AA1 K AH0 T",
        "seldom": "S EH1 L D AH0 M", "signal": "S IH1 G N AH0 L",
        "silver": "S IH1 L V ER0", "sudden": "S AH1 D AH0 N",
        "summer": "S AH1 M ER0", "trumpet": "T R AH1 M P AH0 T",
        "tunnel": "T AH1 N AH0 L", "winter": "W IH1 N T ER0",
        "window": "W IH1 N D OW0", "paper": "P EY1 P ER0",
        "sister": "S IH1 S T ER0", "yellow": "Y EH1 L OW0",
        "garden": "G AA1 R D AH0 N", "butter": "B AH1 T ER0",
        "candle": "K AE1 N D AH0 L", "monkey": "M AH1 NG K IY0",
    },
    "two_syl_final_stress": {
        "deny": "D IH0 N AY1", "mistake": "M IH0 S T EY1 K",
        "obey": "OW0 B EY1", "polite": "P AH0 L AY1 T",
        "pretend": "P R IH0 T EH1 N D", "protect": "P R AH0 T EH1 K T",
        "suppose": "S AH0 P OW1 Z", "surprise": "S ER0 P R AY1 Z",
        "destroy": "D IH0 S T R OY1", "explode": "IH0 K S P L OW1 D",
        "conclude": "K AH0 N K L UW1 D", "delight": "D IH0 L AY1 T",
        "remark": "R IH0 M AA1 R K", "parade": "P ER0 EY1 D",
    },
    "three_plus_syl": {
        "animal": "AE1 N AH0 M AH0 L", "banana": "B AH0 N AE1 N AH0",
        "camera": "K AE1 M ER0 AH0", "capital": "K AE1 P AH0 T AH0 L",
        "cinnamon": "S IH1 N AH0 M AH0 N",
        "computer": "K AH0 M P Y UW1 T ER0",
        "difficult": "D IH1 F AH0 K AH0 L T",
        "elephant": "EH1 L AH0 F AH0 N T", "energy": "EH1 N ER0 JH IY0",
        "family": "F AE1 M AH0 L IY0",
        "festival": "F EH1 S T AH0 V AH0 L",
        "general": "JH EH1 N ER0 AH0 L",
        "hospital": "HH AA1 S P IH0 T AH0 L",
        "important": "IH0 M P AO1 R T AH0 N T",
        "industry": "IH1 N D AH0 S T R IY0",
        "medicine": "M EH1 D AH0 S AH0 N", "memory": "M EH1 M ER0 IY0",
        "musical": "M Y UW1 Z IH0 K AH0 L",
        "natural": "N AE1 CH ER0 AH0 L",
        "official": "AH0 F IH1 SH AH0 L",
        "opinion": "AH0 P IH1 N Y AH0 N",
        "oxygen": "AA1 K S AH0 JH AH0 N", "piano": "P IY0 AE1 N OW0",
        "popular": "P AA1 P Y AH0 L ER0",
        "positive": "P AA1 Z AH0 T IH0 V",
        "president": "P R EH1 Z AH0 D AH0 N T",
        "probably": "P R AA1 B AH0 B L IY0",
        "regular": "R EH1 G Y AH0 L ER0", "several": "S EH1 V ER0 AH0 L",
        "telephone": "T EH1 L AH0 F OW2 N",
        "tomorrow": "T AH0 M AA1 R OW2",
        "umbrella": "AH0 M B R EH1 L AH0",
        "victory": "V IH1 K T ER0 IY0", "visitor": "V IH1 Z IH0 T ER0",
        "wonderful": "W AH1 N D ER0 F AH0 L",
    },
    "latinate_suffixes": {
        "nation": "N EY1 SH AH0 N", "station": "S T EY1 SH AH0 N",
        "question": "K W EH1 S CH AH0 N", "mission": "M IH1 SH AH0 N",
        "education": "EH2 JH AH0 K EY1 SH AH0 N",
        "information": "IH2 N F ER0 M EY1 SH AH0 N",
        "decision": "D IH0 S IH1 ZH AH0 N",
        "television": "T EH1 L AH0 V IH2 ZH AH0 N",
        "measure": "M EH1 ZH ER0", "treasure": "T R EH1 ZH ER0",
        "ability": "AH0 B IH1 L AH0 T IY0", "serious": "S IH1 R IY0 AH0 S",
        "famous": "F EY1 M AH0 S",
        "dangerous": "D EY1 N JH ER0 AH0 S",
        "courage": "K ER1 IH0 JH", "village": "V IH1 L IH0 JH",
    },
    "irregular": {
        "once": "W AH1 N S", "whose": "HH UW1 Z", "does": "D AH1 Z",
        "done": "D AH1 N", "gone": "G AO1 N", "said": "S EH1 D",
        "says": "S EH1 Z", "been": "B IH1 N", "busy": "B IH1 Z IY0",
        "woman": "W UH1 M AH0 N", "women": "W IH1 M AH0 N",
        "friend": "F R EH1 N D", "heart": "HH AA1 R T",
        "laugh": "L AE1 F", "enough": "IH0 N AH1 F", "rough": "R AH1 F",
        "tough": "T AH1 F", "though": "DH OW1", "through": "TH R UW1",
        "thought": "TH AO1 T",
    },
}

VOWEL_CHARS = set("aeiouæɑɒɔəɚɛɜɪʊʌɝ") | {"aɪ", "aʊ", "eɪ", "oʊ", "ɔɪ"}


def _edit_distance(a: str, b: str) -> int:
    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return int(d[-1])


def _strip(s: str) -> str:
    return s.replace("ˈ", "").replace("ˌ", "")


def _per(pairs) -> float:
    num = sum(_edit_distance(_strip(h), _strip(g)) for h, g in pairs)
    den = sum(len(_strip(g)) for _, g in pairs)
    return num / max(den, 1)


def _stressed_vowel_index(ipa: str):
    """Index (in vowels) of the primary-stressed vowel; None if unmarked.
    Counting vowels *before* the mark makes onset-vs-nucleus placement
    conventions agree."""
    if "ˈ" not in ipa:
        return None
    before = ipa.split("ˈ")[0]
    return sum(1 for ch in before if ch in "aeiouæɑɒɔəɚɛɜɪʊʌɝ")


def _gold() -> dict:
    return {
        cat: {w: arpabet_to_ipa(a.split()) for w, a in words.items()}
        for cat, words in GOLD_ARPA.items()
    }


def test_gold_is_wide_enough():
    gold = _gold()
    n = sum(len(v) for v in gold.values())
    assert n >= 200, n
    assert len(gold) == 10


def test_report_and_bounds():
    """Per-category PER + stress accuracy; prints the PARITY.md table."""
    gold = _gold()
    rows = []
    all_lex, all_lts = [], []
    stress_ok = stress_n = 0
    for cat, words in gold.items():
        lex_pairs, lts_pairs = [], []
        for w, g in words.items():
            h = word_to_ipa(w)
            (lex_pairs if w in _LEXICON else lts_pairs).append((h, g))
            # stress accuracy only where stress is informative: the
            # lexicon (reasonably) leaves monosyllables unmarked
            polysyllabic = (
                sum(a[-1].isdigit() for a in GOLD_ARPA[cat][w].split()) >= 2
            )
            if (
                w in _LEXICON
                and polysyllabic
                and _stressed_vowel_index(g) is not None
            ):
                stress_n += 1
                stress_ok += (
                    _stressed_vowel_index(h) == _stressed_vowel_index(g)
                )
        all_lex += lex_pairs
        all_lts += lts_pairs
        rows.append((cat, len(words), len(lex_pairs),
                     _per(lex_pairs) if lex_pairs else float("nan"),
                     _per(lts_pairs) if lts_pairs else float("nan")))

    print("\ncategory                 n  lex  PER(lex)  PER(lts)")
    for cat, n, nlex, pl, pt in rows:
        print(f"{cat:22s} {n:3d}  {nlex:3d}   {pl:7.3f}   {pt:7.3f}")
    total = len(all_lex) + len(all_lts)
    print(f"overall: n={total} lexicon-hit-rate={len(all_lex)/total:.2f} "
          f"PER(lex)={_per(all_lex):.3f} PER(lts)={_per(all_lts):.3f} "
          f"stress-acc(lex)={stress_ok}/{stress_n}"
          f"={stress_ok/max(stress_n,1):.2f}")

    # regression bounds (generous vs the recorded numbers in PARITY.md)
    assert _per(all_lex) < 0.08, "embedded lexicon drifted from CMUdict"
    assert _per(all_lts) < 0.45, "LTS rules regressed"
    assert stress_ok / max(stress_n, 1) > 0.85, "lexicon stress drifted"


def test_monosyllable_lts_strong():
    """The LTS should stay strong on regular monosyllables (the categories
    where rules can win); polysyllabic reduction is its known weak spot."""
    gold = _gold()
    mono = {}
    for cat in ("clusters", "silent_e", "vowel_teams", "r_colored"):
        mono.update(gold[cat])
    pairs = [(word_to_ipa(w), g) for w, g in mono.items()
             if w not in _LEXICON]
    assert len(pairs) >= 40
    rate = _per(pairs)
    print(f"\nmonosyllable LTS PER: {rate:.3f} over {len(pairs)} words")
    assert rate < 0.30, rate
