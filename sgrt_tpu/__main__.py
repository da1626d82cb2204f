import sys

from sgrt_tpu.cli import main

sys.exit(main())
