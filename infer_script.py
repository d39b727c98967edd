#!/usr/bin/env python
"""Store-backed (OMERO) inference entry point (reference parity: infer_script.py)."""
import sys

from microbeseg_tpu.cli.infer_store import main

if __name__ == "__main__":
    sys.exit(main())
