"""Run-id helpers (reference common/utils/idhelper.py:6-16)."""
from __future__ import annotations

import datetime
import re

_FORMAT = "%y%m%d-%H%M%S"
_ID_RE = re.compile(r"^\d{6}-\d{6}")


def unique_identifier() -> str:
    return datetime.datetime.now().strftime(_FORMAT)


def extract_leading_identifier(name: str) -> str:
    """Leading '<yymmdd-HHMMSS>' prefix of a run name, or '' (resume detection,
    reference common/trainloop/context.py:117-134)."""
    m = _ID_RE.match(name)
    return m.group(0) if m else ""
