"""``python -m etl_city_directories_spark`` — the spacetime-etl-style
step runner (see cli.py)."""

import sys

from etl_city_directories_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
