#!/usr/bin/env python
"""Headless evaluation entry point (new; the reference only evaluates via GUI)."""
import sys

from microbeseg_tpu.cli.evaluate import main

if __name__ == "__main__":
    sys.exit(main())
