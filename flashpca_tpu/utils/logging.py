"""Timestamped logging.

Mirrors the reference's ``timestamp()`` prefix convention
(reference: util.cpp:270-283, flag --notime at flashpca.cpp:89,108):
every log line is prefixed with ``[asctime] `` unless timestamps are
globally disabled.
"""

from __future__ import annotations

import sys
import time

_show_timestamp = True


def set_show_timestamp(show: bool) -> None:
    global _show_timestamp
    _show_timestamp = bool(show)


def timestamp() -> str:
    if _show_timestamp:
        return "[" + time.asctime(time.localtime()) + "] "
    return ""


def log(*args, verbose: bool = True, file=None) -> None:
    """Print a timestamped log line (flushes immediately, like the
    reference's unitbuf stream)."""
    if not verbose:
        return
    out = file if file is not None else sys.stdout
    print(timestamp() + " ".join(str(a) for a in args), file=out, flush=True)
