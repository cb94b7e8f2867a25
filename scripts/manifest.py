#!/usr/bin/env python
"""End-of-queue artifact manifest: list every reports/*.json, flag
missing/empty/invalid ones, exit 1 if any expected artifact is bad.

Usage: python scripts/manifest.py [expected.json ...]
With no args, checks every reports/*.json present.
"""
from __future__ import annotations

import glob
import json
import os
import sys


def check(path: str) -> str:
    if not os.path.exists(path):
        return "MISSING"
    if os.path.getsize(path) == 0:
        return "EMPTY"
    try:
        with open(path) as f:
            json.load(f)
    except Exception:
        return "INVALID-JSON"
    return "ok"


def main() -> int:
    paths = sys.argv[1:] or sorted(glob.glob("reports/*.json"))
    bad = 0
    for p in paths:
        status = check(p)
        size = os.path.getsize(p) if os.path.exists(p) else 0
        print(f"{status:13s} {size:9d}  {p}")
        if status != "ok":
            bad += 1
    if bad:
        print(f"\n{bad} BAD ARTIFACT(S) — do not commit these.")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
