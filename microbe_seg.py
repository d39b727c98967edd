#!/usr/bin/env python
"""GUI entry point (reference parity: microbe_seg.py).

The Qt GUI is import-gated: this environment ships no PyQt5, so the entry
point reports the headless alternatives instead of crashing.
"""
import sys


def main() -> int:
    try:
        import PyQt5  # noqa: F401
    except ImportError:
        print("PyQt5 is not installed - the GUI is unavailable in this "
              "environment.\nHeadless equivalents:\n"
              "  python train_script.py --train_dir <trainset>\n"
              "  python infer_script_local.py -i <imgs> -m <model>\n"
              "  python infer_script.py --local_store <store> -m <model>\n"
              "  python eval_script.py -d <trainset> -m <models...>\n"
              "  python -m microbeseg_tpu.cli.serve -m <model> -p 8000")
        return 1
    from microbeseg_tpu.gui.app import run_gui
    return run_gui()


if __name__ == "__main__":
    sys.exit(main())
