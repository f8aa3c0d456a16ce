"""`beartype.typing` re-exports the stdlib typing surface."""

from typing import *  # noqa: F401,F403
from typing import Tuple, Union, Optional, List, Dict, Callable  # noqa: F401
