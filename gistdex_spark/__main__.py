"""`python -m gistdex_spark ...` → the CLI (reference: `src/index.ts` bin)."""

import sys

from gistdex_spark.cli import main

sys.exit(main())
