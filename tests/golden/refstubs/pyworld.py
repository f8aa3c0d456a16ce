"""Import-time stand-in for `pyworld` (reference :39).

Golden tests always pass `pitch=` explicitly, so dio/stonemask never run.
"""


def dio(*args, **kwargs):
    raise NotImplementedError("refstub pyworld.dio: pass pitch explicitly")


def stonemask(*args, **kwargs):
    raise NotImplementedError("refstub pyworld.stonemask: pass pitch explicitly")
