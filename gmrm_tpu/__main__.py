import sys

from gmrm_tpu.cli import main

sys.exit(main())
