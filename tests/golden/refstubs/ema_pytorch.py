"""Import-time stand-in for `ema_pytorch.EMA` (reference :36, Trainer only)."""


class EMA:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("refstub EMA is import-only")
