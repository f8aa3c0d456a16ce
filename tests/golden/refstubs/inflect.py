"""Import-time stand-in for `inflect` (reference number/time expanders).

Text-normalisation goldens are out of scope (covered by the repo's own
frontend tests); any runtime use raises.
"""


class _Engine:
    def __getattr__(self, name):
        def _raise(*args, **kwargs):
            raise NotImplementedError(f"refstub inflect.engine().{name} is import-only")

        return _raise


def engine():
    return _Engine()
