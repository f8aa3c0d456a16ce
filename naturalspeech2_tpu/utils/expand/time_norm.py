"""Clock-time expansion (host-side).

Counterpart of `/root/reference/naturalspeech2_pytorch/utils/expand/
time_norm.py`: ``HH:MM am/pm`` → spoken words ("9:30 am" → "nine thirty a m",
"oh" for minutes < 10), using the native number-to-words.
"""

from __future__ import annotations

import re

from naturalspeech2_tpu.utils.expand.number_norm import number_to_words


class TimeExpander:
    def __init__(self):
        self._time_re = re.compile(
            r"""\b
            ((0?[0-9])|(1[0-1])|(1[2-9])|(2[0-3]))   # hours
            :
            ([0-5][0-9])                             # minutes
            \s*(a\.m\.|am|pm|p\.m\.|a\.m|p\.m)?      # am/pm
            \b""",
            re.IGNORECASE | re.X,
        )

    def _expand_match(self, match: re.Match, language: str) -> str:
        hour = int(match.group(1))
        if hour > 12:
            hour -= 12
        elif hour == 0:
            hour = 12
        words = [number_to_words(hour, language)]

        minute = int(match.group(6))
        if minute > 0:
            if minute < 10:
                words.append("oh")
            words.append(number_to_words(minute, language))

        am_pm = match.group(7)
        if am_pm is not None:
            words.extend(list(am_pm.replace(".", "")))
        return " ".join(words)

    def expand_time(self, text: str, language: str = "en") -> str:
        return self._time_re.sub(
            lambda m: self._expand_match(m, language), text
        )
