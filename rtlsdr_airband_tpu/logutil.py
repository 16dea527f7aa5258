"""Logging destinations: syslog / stderr / none (reference: src/logging.cpp).

``log(level, msg)`` mirrors the reference's interface; ``error()`` is fatal
(reference: logging.cpp:31-34 `_Exit(1)`), softened here to raising
SystemExit so library users can catch it.
"""

from __future__ import annotations

import sys
import syslog as _syslog

LOG_ERR = _syslog.LOG_ERR
LOG_WARNING = _syslog.LOG_WARNING
LOG_NOTICE = _syslog.LOG_NOTICE
LOG_INFO = _syslog.LOG_INFO

_DEST = "stderr"  # 'syslog' | 'stderr' | 'none'
_NAMES = {LOG_ERR: "ERROR", LOG_WARNING: "WARN", LOG_NOTICE: "NOTICE", LOG_INFO: "INFO"}


def init_logging(dest: str) -> None:
    global _DEST
    _DEST = dest
    if dest == "syslog":
        _syslog.openlog("rtlsdr_airband_tpu", _syslog.LOG_PID, _syslog.LOG_DAEMON)


def log(level: int, msg: str) -> None:
    if _DEST == "none":
        return
    if _DEST == "syslog":
        _syslog.syslog(level, msg)
    else:
        print(f"[{_NAMES.get(level, level)}] {msg}", file=sys.stderr, flush=True)


def error(msg: str) -> None:
    log(LOG_ERR, msg)
    raise SystemExit(1)
