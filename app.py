"""spark-submit entry point: `spark-submit --py-files <pkg.zip> app.py <cmd> ...`
Thin wrapper over mobility_lakehouse_project_spark.app:main (north_star:
single spark-submit --py-files application)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mobility_lakehouse_project_spark.app import main  # noqa: E402

raise SystemExit(main(sys.argv[1:]))
