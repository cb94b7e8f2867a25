"""Console colors + tiny logger (the reference used bare ANSI constants as
its logging subsystem, yolo_modules/global_variable.py:10-18)."""
from __future__ import annotations

import sys


class ansi:
    black = "\033[1;30m"
    red = "\033[1;31m"
    green = "\033[1;32m"
    yellow = "\033[1;33m"
    blue = "\033[1;34m"
    magenta = "\033[1;35m"
    cyan = "\033[1;36m"
    white = "\033[1;37m"
    reset = "\033[0m"


def log(msg: str, color: str = "", *, verbose: bool = True):
    if not verbose:
        return
    c = getattr(ansi, color, "")
    print(f"{c}{msg}{ansi.reset if c else ''}", file=sys.stderr, flush=True)
