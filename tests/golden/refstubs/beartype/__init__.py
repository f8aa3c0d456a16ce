"""Minimal stand-in for `beartype` so the reference package can import.

The reference (`/root/reference/naturalspeech2_pytorch`) decorates some
functions/classes with @beartype purely for runtime type checking; the
decorator is semantically an identity wrapper.  Only what the reference
actually touches is provided.
"""


def beartype(obj=None, **_kwargs):
    if obj is None:
        return lambda o: o
    return obj
