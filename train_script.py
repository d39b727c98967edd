#!/usr/bin/env python
"""Headless training entry point (reference parity: train_script.py)."""
import sys

from microbeseg_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
