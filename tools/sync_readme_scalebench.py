#!/usr/bin/env python
"""Regenerate README.md's two scale-headroom tables from SCALEBENCH.json.

The round-6 ADVICE flagged claim-drift between prose numbers and the
committed SCALEBENCH artifact; this closes the class for the two tables:
run this after every scale_bench.py refresh, and
``tests/test_readme_scalebench_sync.py`` fails the build whenever a table
row disagrees with SCALEBENCH.json (same formatting rules live in both —
imported from here).
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEAVY_HEADER = "| operator | ×1 | ×30 | growth @30× |"
REL_HEADER = "| query | ×1 | ×30 | growth @30× |"


def format_rows(section: dict[str, dict[str, float]]) -> list[str]:
    rows = []
    for name, t in section.items():
        if "x1" not in t or "x30" not in t or "growth_x30" not in t:
            continue
        rows.append(
            f"| {name} | {t['x1']:.2f} s | {t['x30']:.2f} s | "
            f"**{t['growth_x30']:.1f}×** |"
        )
    return rows


def replace_table(text: str, header: str, rows: list[str]) -> str:
    # header line, separator line, then existing rows up to the first
    # non-table line — replaced wholesale by the regenerated rows
    pattern = re.compile(
        re.escape(header) + r"\n\|[-|]+\|\n(?:\|[^\n]*\|\n)+"
    )
    repl = header + "\n|---|---|---|---|\n" + "\n".join(rows) + "\n"
    new, n = pattern.subn(repl, text)
    if n != 1:
        raise SystemExit(f"expected exactly one table under {header!r}, found {n}")
    return new


def expected_tables() -> tuple[list[str], list[str]]:
    with open(os.path.join(ROOT, "SCALEBENCH.json")) as f:
        d = json.load(f)
    return format_rows(d["queries"]), format_rows(d["relational_queries"])


def main() -> None:
    heavy, rel = expected_tables()
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        text = f.read()
    text = replace_table(text, HEAVY_HEADER, heavy)
    text = replace_table(text, REL_HEADER, rel)
    with open(path, "w") as f:
        f.write(text)
    print(f"synced {len(heavy)} heavy + {len(rel)} relational rows", file=sys.stderr)


if __name__ == "__main__":
    main()
