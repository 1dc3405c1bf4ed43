"""``python -m saugns_tpu`` — the single-command entry point, the
analog of invoking the reference's ``saugns`` binary (saugns.c:670)."""
import sys

from .cli import main

sys.exit(main())
