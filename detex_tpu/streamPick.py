"""
Placeholder for the reference's PyQt4 pick GUI (detex/streamPick.py).

detex_tpu replaces the interactive picking workflow with file-based and
automatic alternatives:

- ``detex_tpu.util.autoPickPhases`` — automatic STA/LTA phase picker that
  writes the standard PhasePicks.csv
- ``SubSpace.attachPickTimes`` — attach picks from a csv/pickle file
- ``SubSpace.autoPickTimes`` — automatic group trims without a picks file
"""
from __future__ import annotations

import detex_tpu


def streamPick(*args, **kwargs):
    """The PyQt4 GUI is not supported; see the module docstring for the
    file-based replacements."""
    detex_tpu.log(__name__, "the interactive streamPick GUI is not "
                  "supported in detex_tpu; use util.autoPickPhases, "
                  "SubSpace.attachPickTimes, or SubSpace.autoPickTimes",
                  level="error", e=NotImplementedError)
