"""Logging setup: stdout + per-run log file (reference common/utils/logginghelper.py:5-16)."""
from __future__ import annotations

import logging
import os
import sys


def setup_logging(log_dir: str = None, filename: str = "log.txt",
                  level=logging.INFO):
    root = logging.getLogger()
    root.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) and h.stream is sys.stdout
               for h in root.handlers):
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        root.addHandler(sh)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, filename)
        if not any(isinstance(h, logging.FileHandler)
                   and getattr(h, "baseFilename", None) == os.path.abspath(path)
                   for h in root.handlers):
            fh = logging.FileHandler(path)
            fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
            root.addHandler(fh)
