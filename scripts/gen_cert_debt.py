#!/usr/bin/env python
"""Regenerate the certification-debt table at the top of STATUS.md.

The driver's DuckDB check (CORRECTNESS_r{N}.json, ~50 ops/round) is the
only hard correctness signal; this table makes the gap between registry
size and driver-certified coverage impossible to lose track of (round-9
VERDICT item 2). For every registry op it records the round of its
latest green driver row — hash pass, or a rows-only (`no_oracle`) run
that produced rows — bucketed stalest-first, with the never-sampled set
spelled out op by op. Run at every round close (after the driver's
CORRECTNESS file lands, or before close using the accumulated files);
the block between the CERT_DEBT markers is replaced in place.
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import cdc_pubsub_spark.all_queries  # noqa: E402,F401
from cdc_pubsub_spark.registry import REGISTRY  # noqa: E402

BEGIN = "<!-- CERT_DEBT_BEGIN (scripts/gen_cert_debt.py) -->"
END = "<!-- CERT_DEBT_END -->"


def latest_green() -> tuple[dict[str, int], int]:
    """op -> round of its latest green row; plus the newest round seen."""
    green: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        max_round = max(max_round, rnd)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
            )
            # Latest row wins either way: a later failure re-opens the op.
            if ok:
                green[name] = rnd
            else:
                green.pop(name, None)
    return green, max_round


def render() -> str:
    green, max_round = latest_green()
    names = sorted(REGISTRY)
    never = [n for n in names if n not in green]
    buckets: dict[int, list[str]] = {}
    for n in names:
        if n in green:
            buckets.setdefault(green[n], []).append(n)
    lines = [
        BEGIN,
        "",
        "## Certification debt (auto-generated — do not edit by hand)",
        "",
        f"Registry: **{len(names)}** ops; driver-certified (latest row "
        f"green): **{len(names) - len(never)}** "
        f"({100 * (len(names) - len(never)) // len(names)}%); "
        f"never driver-sampled: **{len(never)}**. Latest CORRECTNESS "
        f"round: r{max_round:02d}. The `__spark_entry__.py` ordering "
        "drains this table automatically: never-sampled ops lead the "
        "window, then the stalest buckets below, oldest first.",
        "",
        "| Last green round | Ops | Names |",
        "|---|---|---|",
    ]
    if never:
        lines.append(f"| never | {len(never)} | {', '.join(never)} |")
    for rnd in sorted(buckets):
        ops = buckets[rnd]
        lines.append(f"| r{rnd:02d} | {len(ops)} | {', '.join(ops)} |")
    lines += ["", END]
    return "\n".join(lines)


def main() -> None:
    path = os.path.join(HERE, "STATUS.md")
    text = open(path).read()
    block = render()
    if BEGIN in text and END in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END) :]
        text = pre + block + post
    else:
        text = block + "\n\n" + text
    open(path, "w").write(text)
    green, _ = latest_green()
    n = len(REGISTRY)
    print(
        f"cert-debt table regenerated: {n - len([x for x in REGISTRY if x in green])}"
        f"/{n} never-sampled, {len([x for x in REGISTRY if x in green])} certified"
    )


if __name__ == "__main__":
    main()
