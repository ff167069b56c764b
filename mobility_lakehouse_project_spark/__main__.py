"""`python -m mobility_lakehouse_project_spark <cmd>` — see app.py."""

import sys

from .app import main

raise SystemExit(main(sys.argv[1:]))
