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
CDC_HEADER = (
    "| scale | table rows | partitions (affected) | partitioned apply | "
    "full rewrite |"
)
STREAM_HEADER = (
    "| scale | input rows | batches | sessionize max state | "
    "final state | MV state rows |"
)
COMPACT_HEADER = (
    "| scale | table rows | partitions (compacted) | hot files | "
    "scoped compact | full rewrite |"
)
WAREHOUSE_HEADER = (
    "| batches | changes/batch | table rows | first-5 mean | "
    "last-5 mean | last5/first5 | versions on disk |"
)
IVF_HEADER = (
    "| append | corpus rows | frozen recall@10 probe=5% | probe=15% | "
    "probe=50% | re-trained probe=15% |"
)
IVF_CLUSTERED_HEADER = (
    "| probe budget | nprobe | recall@10 | recall-pass wall (10 q) |"
)
ROCKSDB_HEADER = (
    "| workload | provider | batches | state rows (max) | wall |"
)


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


def format_cdc_rows(section: dict[str, dict]) -> list[str]:
    rows = []
    for scale, t in section.items():
        gp = t.get("growth_partitioned")
        gf = t.get("growth_full")
        rows.append(
            f"| ×{scale[1:]} | {t['table_rows']:,} | "
            f"{t['total_partitions']} ({t['affected_partitions']}) | "
            f"{t['partitioned_apply']:.2f} s"
            + (f" (**{gp:.1f}×**)" if gp is not None else "")
            + f" | {t['full_rewrite']:.2f} s"
            + (f" (**{gf:.1f}×**)" if gf is not None else "")
            + " |"
        )
    return rows


def format_stream_rows(section: dict[str, dict]) -> list[str]:
    rows = []
    for scale, t in section.items():
        gi = t.get("growth_input")
        gs = t.get("growth_max_state")
        rows.append(
            f"| ×{scale[1:]} | {t['input_rows']:,}"
            + (f" ({gi:.0f}×)" if gi is not None else "")
            + f" | {t['n_batches']} | {t['sessionize_max_state_rows']:,}"
            + (f" (**{gs:.1f}×**)" if gs is not None else "")
            + f" | {t['sessionize_final_state_rows']:,}"
            + f" | {t['agg_maintenance_state_rows']} |"
        )
    return rows


def format_compaction_rows(section: dict[str, dict]) -> list[str]:
    rows = []
    for scale, t in section.items():
        gs = t.get("growth_scoped")
        gf = t.get("growth_full")
        rows.append(
            f"| ×{scale[1:]} | {t['table_rows']:,} | "
            f"{t['total_partitions']} ({t['compacted_partitions']}) | "
            f"{t['hot_files_before']}→{t['hot_files_after']} | "
            f"{t['scoped_compact']:.2f} s"
            + (f" (**{gs:.1f}×**)" if gs is not None else "")
            + f" | {t['full_rewrite']:.2f} s"
            + (f" (**{gf:.1f}×**)" if gf is not None else "")
            + " |"
        )
    return rows


def format_warehouse_rows(section: dict) -> list[str]:
    if not section:
        return []
    return [
        f"| {section['n_batches']} | {section['changes_per_batch']:,} | "
        f"{section['table_rows']:,} | {section['first5_mean']:.2f} s | "
        f"{section['last5_mean']:.2f} s | "
        f"**{section['drift_last5_over_first5']:.2f}×** | "
        f"{section['versions_on_disk_final']} |"
    ]


def format_ivf_rows(section: dict) -> list[str]:
    rows = []
    for key, t in section.items():
        if not key.startswith("append_"):
            continue
        label = key[len("append_"):].replace("_", " ")
        rows.append(
            f"| {label} | {t['corpus_rows']:,} | "
            f"{t['recall_frozen_probe5pct']:.2f} | "
            f"{t['recall_frozen_probe15pct']:.2f} | "
            f"{t['recall_frozen_probe50pct']:.2f} | "
            f"**{t['recall_retrained_probe15pct']:.2f}** |"
        )
    d = section.get("defaults")
    if d:
        met = "met" if d.get("meets_target_090") else "MISSED"
        rows.append(
            f"| shipped defaults (√N cells, ½-cell probe: "
            f"np={d['nprobe']} of {d['n_cells']}) | {d['corpus_rows']:,} | "
            f"{d['recall_at10']:.2f} | — | — | **≥0.9 target: {met}** |"
        )
    return rows


def format_ivf_clustered_rows(section: dict) -> list[str]:
    rows = []
    for key, t in section.items():
        if not key.startswith("probe_"):
            continue
        label = key[len("probe_"):].replace("pct", "%")
        rows.append(
            f"| {label} of cells | {t['nprobe']} | "
            f"**{t['recall_at10']:.2f}** | "
            f"{t['recall_pass_wall_10q']:.2f} s |"
        )
    return rows


def format_rocksdb_rows(section: dict) -> list[str]:
    rows = []
    for prov in ("hdfs", "rocksdb"):
        t = section.get(f"sessionize_{prov}")
        if not t:
            continue
        rows.append(
            f"| sessionize soak | {prov} | {t['n_batches']} | "
            f"{t['max_state_rows']:,} | {t['wall']:.1f} s |"
        )
    c = section.get("cdc_warehouse")
    if c:
        rows.append(
            f"| CDC warehouse stream | {c['provider']} | {c['n_batches']} | "
            f"TableStore-resident | {c['drain_wall']:.1f} s "
            f"({c['mean_batch_wall']:.2f} s/batch) |"
        )
    return rows


def replace_table(text: str, header: str, rows: list[str]) -> str:
    # header line, separator line, then existing rows up to the first
    # non-table line — replaced wholesale by the regenerated rows
    pattern = re.compile(
        re.escape(header) + r"\n\|[-|]+\|\n(?:\|[^\n]*\|\n)+"
    )
    n_cols = header.count("|") - 1
    repl = (
        header + "\n|" + "---|" * n_cols + "\n" + "\n".join(rows) + "\n"
    )
    new, n = pattern.subn(repl, text)
    if n != 1:
        raise SystemExit(f"expected exactly one table under {header!r}, found {n}")
    return new


def expected_tables() -> tuple[
    list[str], list[str], list[str], list[str], list[str], list[str],
    list[str], list[str], list[str],
]:
    with open(os.path.join(ROOT, "SCALEBENCH.json")) as f:
        d = json.load(f)
    return (
        format_rows(d["queries"]),
        format_rows(d["relational_queries"]),
        format_cdc_rows(d.get("cdc_partitioned", {})),
        format_stream_rows(d.get("streaming_state", {})),
        format_compaction_rows(d.get("compaction", {})),
        format_warehouse_rows(d.get("streaming_warehouse", {})),
        format_ivf_rows(d.get("ivf_refresh", {})),
        format_ivf_clustered_rows(d.get("ivf_clustered", {})),
        format_rocksdb_rows(d.get("streaming_warehouse_rocksdb", {})),
    )


def main() -> None:
    (
        heavy, rel, cdc, stream, compact, wh, ivf, ivfc, rocks,
    ) = expected_tables()
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        text = f.read()
    text = replace_table(text, HEAVY_HEADER, heavy)
    text = replace_table(text, REL_HEADER, rel)
    text = replace_table(text, CDC_HEADER, cdc)
    text = replace_table(text, STREAM_HEADER, stream)
    text = replace_table(text, COMPACT_HEADER, compact)
    text = replace_table(text, WAREHOUSE_HEADER, wh)
    text = replace_table(text, IVF_HEADER, ivf)
    text = replace_table(text, IVF_CLUSTERED_HEADER, ivfc)
    text = replace_table(text, ROCKSDB_HEADER, rocks)
    with open(path, "w") as f:
        f.write(text)
    print(
        f"synced {len(heavy)} heavy + {len(rel)} relational + {len(cdc)} "
        f"cdc + {len(stream)} streaming-state + {len(compact)} "
        f"compaction + {len(wh)} warehouse + {len(ivf)} ivf-refresh rows",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
