"""Import-time stand-in for `num2words`."""


def num2words(*args, **kwargs):
    raise NotImplementedError("refstub num2words is import-only")
