"""espeak / espeak-ng subprocess G2P (host-side).

Counterpart of `/root/reference/naturalspeech2_pytorch/utils/phonemizers/
espeak_wrapper.py`: auto-detects espeak-ng (preferred) or espeak, invokes it
with ``--ipa`` flags, strips version-specific leading separators and
language-switch flags from the output, and exposes supported languages via
``--voices``. Text preprocessing stays a host-side subprocess, outside jit,
exactly as in the reference pipeline (SURVEY.md §2.5).
"""

from __future__ import annotations

import re
import shutil
import subprocess
from typing import Dict, List, Optional

from naturalspeech2_tpu.utils.phonemizers.base import BasePhonemizer
from naturalspeech2_tpu.utils.phonemizers.punctuation import Punctuation


def _which(name: str) -> bool:
    return shutil.which(name) is not None


def detect_espeak_binary() -> Optional[str]:
    """espeak-ng preferred over espeak (reference :37-45)."""
    for binary in ("espeak-ng", "espeak"):
        if _which(binary):
            return binary
    return None


def _run_espeak(binary: str, args: List[str]) -> List[str]:
    cmd = [binary, "-q", "-b", "1", *args]
    out = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, check=False
    )
    return out.stdout.decode("utf8").splitlines()


class ESpeak(BasePhonemizer):
    """Subprocess G2P through espeak/espeak-ng, coqui-compatible output
    cleanup (leading separator chars, ``(lang)`` switch flags)."""

    def __init__(
        self,
        language: str,
        backend: Optional[str] = None,
        punctuations: str = Punctuation.default_puncs(),
        keep_puncs: bool = True,
    ):
        self.backend = backend or detect_espeak_binary()
        if self.backend is None:
            raise RuntimeError(
                "no espeak backend found — install espeak-ng or espeak, or "
                "use the pure-python fallback phonemizer "
                "(naturalspeech2_tpu.utils.phonemizers.fallback.RuleBasedG2P)"
            )
        if language == "en":
            language = "en-us"
        super().__init__(language, punctuations=punctuations, keep_puncs=keep_puncs)

    @staticmethod
    def name() -> str:
        return "espeak"

    @classmethod
    def is_available(cls) -> bool:
        return detect_espeak_binary() is not None

    def version(self) -> str:
        idx = 3 if self.backend == "espeak-ng" else 2
        for line in _run_espeak(self.backend, ["--version"]):
            parts = line.strip().split()
            if len(parts) > idx:
                return parts[idx]
        return "unknown"

    def is_supported_language(self, language: str) -> bool:
        # querying --voices on every ctor is slow; accept and let espeak error
        return True

    @staticmethod
    def supported_languages() -> Dict[str, str]:
        binary = detect_espeak_binary()
        if binary is None:
            return {}
        langs: Dict[str, str] = {}
        for i, line in enumerate(_run_espeak(binary, ["--voices"])):
            if i == 0:
                continue
            cols = line.split()
            if len(cols) >= 4:
                langs[cols[1]] = cols[3]
        return langs

    def phonemize_espeak(self, text: str, separator: str = "|", tie: bool = False) -> str:
        args = ["-v", self._language]
        if self.backend == "espeak-ng":
            args.append("--ipa=3" if tie else "--ipa=1")
        else:
            args.append("--ipa=1" if tie else "--ipa=3")
        if tie:
            args.append("--tie=͡")
        args.append(f'"{text}"')

        phonemes = ""
        for line in _run_espeak(self.backend, args):
            decoded = line.strip()
            # drop the version-dependent leading separator character
            decoded = decoded[:1].replace("_", "") + decoded[1:]
            # remove (lang) switch flags espeak-ng inserts
            decoded = re.sub(r"\(.+?\)", "", decoded)
            phonemes += decoded.strip()
        return phonemes.replace("_", separator)

    def _phonemize(self, text: str, separator: str = "") -> str:
        return self.phonemize_espeak(text, separator, tie=False)
