"""Load the ACTUAL reference torch implementation for golden parity tests.

`/root/reference` (lucidrains/naturalspeech2-pytorch v0.1.8) is importable
in this image once its unavailable pip deps are satisfied by the tiny
import-only stand-ins in `tests/golden/refstubs/` (torch, einops and
accelerate are real).  Nothing from the reference is copied — the package
is imported read-only from its own tree, and only inside tests.

This upgrades `tests/reference_oracle.py` (a numpy transliteration) to
TRUE golden evidence: the torch binary itself computes the expected
activations (ROADMAP "Verification debt" item 1).
"""

import importlib
import sys
from pathlib import Path

REF_ROOT = Path("/root/reference")
STUBS = Path(__file__).resolve().parent / "refstubs"

_cache = {}


def reference_available():
    if not (REF_ROOT / "naturalspeech2_pytorch").is_dir():
        return False
    try:
        import torch  # noqa: F401
        import einops  # noqa: F401
    except Exception:
        return False
    return True


def load_reference():
    """Import and return the reference package modules.

    Returns a namespace with `.ns2` (naturalspeech2_pytorch.naturalspeech2_pytorch),
    `.aligner`, `.attend` modules.  Idempotent.
    """
    if "ns" in _cache:
        return _cache["ns"]

    for p in (str(STUBS), str(REF_ROOT)):
        if p not in sys.path:
            # stubs must shadow nothing real: they sit at the END of
            # sys.path so any genuinely installed dep wins.
            sys.path.append(p)

    ns2 = importlib.import_module(
        "naturalspeech2_pytorch.naturalspeech2_pytorch"
    )
    aligner = importlib.import_module("naturalspeech2_pytorch.aligner")
    attend = importlib.import_module("naturalspeech2_pytorch.attend")

    class _NS:
        pass

    out = _NS()
    out.ns2 = ns2
    out.aligner = aligner
    out.attend = attend
    _cache["ns"] = out
    return out
