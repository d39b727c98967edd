#!/usr/bin/env python
"""Local-file inference entry point (reference parity: infer_script_local.py)."""
import sys

from microbeseg_tpu.cli.infer_local import main

if __name__ == "__main__":
    sys.exit(main())
