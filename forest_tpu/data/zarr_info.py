"""Cube inspector CLI: tree summary of a (hierarchical or legacy) cube.

Behavioral contract from /root/reference/utils/zarr_info.py:47-331 (SURVEY.md
§2.2): list groups/arrays with shapes, dtypes, chunks, attrs, per-band
statistics, years, plus an optional full meta dump.

Run: python -m forest_tpu.data.zarr_info CUBE.zarr [--meta]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import List

from forest_tpu.data import zarrlite as zl


def _fmt_array(name: str, a: zl.ZarrArray, indent: str) -> List[str]:
    comp = (a.compressor or {}).get("id", "raw")
    lines = [f"{indent}{name}  shape={tuple(a.shape)} dtype={a.dtype} "
             f"chunks={tuple(a.chunks)} comp={comp}"]
    st = a.attrs.get("statistics")
    if st and st.get("n_valid"):
        lines.append(
            f"{indent}  stats: mean={st.get('mean', 0):.4g} "
            f"sd={st.get('sd', 0):.4g} "
            f"[{st.get('min', 0):.4g}, {st.get('max', 0):.4g}] "
            f"n={st.get('n_valid')}")
    return lines


def _walk(g: zl.ZarrGroup, indent: str = "") -> List[str]:
    lines = []
    for k in g.keys():
        v = g[k]
        if isinstance(v, zl.ZarrGroup):
            lines.append(f"{indent}{k}/")
            lines.extend(_walk(v, indent + "  "))
        else:
            lines.extend(_fmt_array(k, v, indent))
    return lines


def summarize(path: str | Path, show_meta: bool = False) -> str:
    node = zl.open_zarr(path)
    lines = [f"cube: {path}"]
    if isinstance(node, zl.ZarrGroup):
        years = node.attrs.get("time_coords")
        if years:
            lines.append(f"years: {years[0]}..{years[-1]} ({len(years)})")
        for k in ("cont_names", "cat_names", "patch_size"):
            if k in node.attrs:
                lines.append(f"{k}: {node.attrs[k]}")
        lines.extend(_walk(node))
        if show_meta:
            lines.append("attrs: " + json.dumps(node.attrs, indent=1))
    else:
        lines.extend(_fmt_array(Path(path).name, node, ""))
    n_files = sum(1 for _ in Path(path).rglob("*") if _.is_file())
    size = sum(f.stat().st_size for f in Path(path).rglob("*")
               if f.is_file())
    lines.append(f"files: {n_files}  bytes: {size:,}")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("--meta", action="store_true")
    a = ap.parse_args(argv)
    print(summarize(a.path, a.meta))


if __name__ == "__main__":
    main()
