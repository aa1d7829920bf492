"""Server logging with verbosity gating.

Behavioral parity with the reference's SRV_INF/WRN/ERR/DBG macros
(reference: llama-box/z_utils.hpp:15-37): DBG lines are emitted only when
verbosity > 5; all lines carry a level tag, timestamp and the calling
function name.
"""

from __future__ import annotations

import sys
import threading
import time

_verbosity = 0
_lock = threading.Lock()


def set_verbosity(v: int) -> None:
    global _verbosity
    _verbosity = int(v)


def get_verbosity() -> int:
    return _verbosity


def log(level: str, func: str, fmt: str, *args) -> None:
    if level == "DBG" and _verbosity <= 5:
        return
    msg = (fmt % args) if args else fmt
    ts = time.strftime("%H:%M:%S")
    line = f"{ts} {level} {func}: {msg}"
    with _lock:
        print(line, file=sys.stderr, flush=True)


def SRV_INF(func: str, fmt: str, *args) -> None:
    log("INF", func, fmt, *args)


def SRV_WRN(func: str, fmt: str, *args) -> None:
    log("WRN", func, fmt, *args)


def SRV_ERR(func: str, fmt: str, *args) -> None:
    log("ERR", func, fmt, *args)


def SRV_DBG(func: str, fmt: str, *args) -> None:
    log("DBG", func, fmt, *args)
