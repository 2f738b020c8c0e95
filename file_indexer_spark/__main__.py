"""``python -m file_indexer_spark`` (reference file_indexer/__main__.py:5-8)."""

import sys

from file_indexer_spark.cli import main

sys.exit(main())
