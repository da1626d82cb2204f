"""`python -m sgrt_tpu.render` — alias for the CLI (see sgrt_tpu.cli)."""

import sys

from sgrt_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
