"""Import-time stand-in for `num_to_words` (indic number words)."""


def num_to_word(*args, **kwargs):
    raise NotImplementedError("refstub num_to_word is import-only")
