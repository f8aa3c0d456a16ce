"""`torchaudio.functional` stand-in (compute_kaldi_pitch, reference :126)."""


def compute_kaldi_pitch(*args, **kwargs):
    raise NotImplementedError(
        "refstub compute_kaldi_pitch: golden tests pass pitch explicitly"
    )
