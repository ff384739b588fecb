"""IO utilities: atomic writes, checksums, JSON/TSV writers.

Behavioral contract from /root/reference/utils/io.py:39-135 (SURVEY.md §2.2).
"""
from __future__ import annotations

import hashlib
import json
import os
import tempfile
from pathlib import Path
from typing import Any, Dict, Iterable, Sequence


def atomic_write(path: str | Path, data: bytes | str) -> Path:
    """Write via a temp file + rename so readers never see partial files."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    fd, tmp = tempfile.mkstemp(dir=path.parent, prefix=f".{path.name}.")
    try:
        with os.fdopen(fd, mode) as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return path


def md5_checksum(path: str | Path, chunk_size: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk_size)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def write_json(path: str | Path, obj: Any, indent: int = 1) -> Path:
    return atomic_write(path, json.dumps(obj, indent=indent, default=str))


def read_json(path: str | Path) -> Any:
    return json.loads(Path(path).read_text())


def write_tsv(path: str | Path, rows: Iterable[Sequence],
              header: Sequence[str] | None = None) -> Path:
    lines = []
    if header:
        lines.append("\t".join(map(str, header)))
    for r in rows:
        lines.append("\t".join(map(str, r)))
    return atomic_write(path, "\n".join(lines) + "\n")


__all__ = ["atomic_write", "md5_checksum", "write_json", "read_json",
           "write_tsv"]
