"""Import-time stand-in for `torchaudio` (reference :17-18).

Mel/Kaldi-pitch paths are not exercised by the golden tests (pitch and
mel are always passed explicitly); every entry point raises loudly so an
accidental use cannot silently diverge.
"""

from . import transforms  # noqa: F401
from . import functional  # noqa: F401


def save(*args, **kwargs):
    raise NotImplementedError("refstub torchaudio.save is import-only")


def load(*args, **kwargs):
    raise NotImplementedError("refstub torchaudio.load is import-only")
