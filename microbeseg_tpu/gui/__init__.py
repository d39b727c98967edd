"""Qt GUI (import-gated on PyQt5).

The reference's GUI (reference: src/microbe_seg_gui.py, 2,884 LoC) drives
every workflow interactively; here the same workflows live in headless
workers (`microbeseg_tpu.client.workers`, `training.workers`,
`evaluation.evaluator`, `inference.engine`) and the GUI is a thin Qt shell
over them.  PyQt5 is not available in the build environment, so this package
imports lazily and `microbe_seg.py` reports headless equivalents when Qt is
missing.
"""
