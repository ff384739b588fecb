"""Timestamped logging shim: log/warn/fail/ensure/timeit.

Behavioral contract from /root/reference/utils/log.py:9-60 (SURVEY.md §2.2).
"""
from __future__ import annotations

import contextlib
import sys
import time
from typing import Iterator


def _stamp() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S")


def log(*msg) -> None:
    print(f"[{_stamp()}]", *msg, flush=True)


def warn(*msg) -> None:
    print(f"[{_stamp()}] WARNING:", *msg, file=sys.stderr, flush=True)


def fail(*msg, code: int = 1) -> None:
    print(f"[{_stamp()}] FATAL:", *msg, file=sys.stderr, flush=True)
    raise SystemExit(code)


def ensure(cond, *msg) -> None:
    if not cond:
        fail(*msg)


@contextlib.contextmanager
def timeit(label: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log(f"{label}: {time.perf_counter() - t0:.2f}s")


__all__ = ["log", "warn", "fail", "ensure", "timeit"]
