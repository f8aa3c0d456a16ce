"""Import-time stand-ins for `audiolm_pytorch.data` (reference :24)."""


class SoundDataset:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("refstub SoundDataset is import-only")


def get_dataloader(*args, **kwargs):
    raise NotImplementedError("refstub get_dataloader is import-only")
