"""`python -m fluidsimulation_tpu` launches the demo CLI (app/demo.py)."""

import sys

from fluidsimulation_tpu.app.demo import main

if __name__ == "__main__":
    sys.exit(main())
