"""`python -m naturalspeech2_tpu` → the ns2-tpu CLI."""

import sys

from naturalspeech2_tpu.cli import main

sys.exit(main())
