"""Import-time stand-ins for `audiolm_pytorch`.

The reference uses these names only as codec *type hints / ctor args*
(`naturalspeech2_pytorch.py:23,:1166`); the golden tests pass their own
fake codec object (or codec=None with target_sample_hz), so behaviour is
never exercised through these classes.
"""

import torch.nn as nn


class SoundStream(nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError("refstub SoundStream is import-only")


class EncodecWrapper(nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError("refstub EncodecWrapper is import-only")
