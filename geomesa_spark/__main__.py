"""``python -m geomesa_spark`` -> the command-line tools (see cli.py)."""

import sys

from geomesa_spark.cli import main

sys.exit(main())
