"""`torchaudio.transforms` stand-in: ctors raise (used only inside
AudioToMel.forward, reference :203-222, which golden tests bypass by
passing mel explicitly)."""


class _Unavailable:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"refstub torchaudio.transforms.{type(self).__name__} is import-only"
        )


class Spectrogram(_Unavailable):
    pass


class MelScale(_Unavailable):
    pass


class AmplitudeToDB(_Unavailable):
    pass


class MelSpectrogram(_Unavailable):
    pass


class Resample(_Unavailable):
    pass
