"""`beartype.door.is_bearable` replacement.

The reference only ever asks about concrete containers of strings
(e.g. `List[str]`, used in `naturalspeech2_pytorch.py:277,:518`), so a
small structural check over typing generics suffices.
"""

import typing


def is_bearable(obj, hint):
    origin = typing.get_origin(hint)
    if origin is None:
        if hint is typing.Any:
            return True
        try:
            return isinstance(obj, hint)
        except TypeError:
            return False
    if origin is typing.Union:
        return any(is_bearable(obj, arg) for arg in typing.get_args(hint))
    if not isinstance(obj, origin):
        return False
    args = typing.get_args(hint)
    if not args:
        return True
    if origin in (list, set, frozenset, tuple):
        if origin is tuple and len(args) == 2 and args[1] is Ellipsis:
            args = (args[0],)
        return all(
            any(is_bearable(item, arg) for arg in args) for item in obj
        )
    return True
