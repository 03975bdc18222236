#!/usr/bin/env python
"""Regenerate the certification-debt table at the top of STATUS.md.

The driver's DuckDB check (CORRECTNESS_r{N}.json, ~50 ops/round) is the
only hard correctness signal; this table makes the gap between registry
size and driver-certified coverage impossible to lose track of (round-9
VERDICT item 2). For every registry op it records the round of its
latest green driver row, bucketed stalest-first, with the never-sampled
set spelled out op by op. The green criterion and round bookkeeping are
IMPORTED from __spark_entry__._certification_state — the same function
that orders the driver window — so this table can never disagree with
the ordering it describes. Run at every round close; the block between
the CERT_DEBT markers is replaced in place.
"""

from __future__ import annotations

import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import cdc_pubsub_spark.all_queries  # noqa: E402,F401
from cdc_pubsub_spark.registry import REGISTRY  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(HERE, "__spark_entry__.py")
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)

BEGIN = "<!-- CERT_DEBT_BEGIN (scripts/gen_cert_debt.py) -->"
END = "<!-- CERT_DEBT_END -->"

README_BEGIN = "<!-- CERT_RISK_BEGIN (scripts/gen_cert_debt.py) -->"
README_END = "<!-- CERT_RISK_END -->"


def _family(name: str) -> str:
    return name.split("_", 1)[0]


def render_readme() -> str:
    """Compact per-family certification-status block for README.md
    (round-10 VERDICT item 7): a consumer of OPERATORS.md must not read
    the registry size as driver-certified coverage. Regenerated at
    every close alongside the STATUS.md table, from the same
    _certification_state, so the two can never disagree."""
    done, _attempts, cert_round = _entry._certification_state()
    names = sorted(REGISTRY)
    fams: dict[str, dict[str, int]] = {}
    for n in names:
        f = fams.setdefault(_family(n), {"total": 0, "certified": 0})
        f["total"] += 1
        f["certified"] += n in done
    never = [n for n in names if n not in done]
    lines = [
        README_BEGIN,
        "",
        "## Certification status",
        "",
        "Every operator has local DuckDB-parity tests at sf0.01 (and "
        "registry-wide sf0.001/sf0.1/sf1 sweeps), but the HARD signal is "
        "the round driver's independent CORRECTNESS row. The two "
        "coverage numbers differ; read `378 operators` as "
        f"**{len(names) - len(never)} driver-certified + "
        f"{len(never)} local-parity-only** "
        "(full per-op table: top of `STATUS.md`, regenerated each "
        "round by `scripts/gen_cert_debt.py`).",
        "",
        "| Family | Ops | Driver-certified | Local-parity-only |",
        "|---|---|---|---|",
    ]
    for fam in sorted(fams):
        f = fams[fam]
        rest = f["total"] - f["certified"]
        lines.append(
            f"| `{fam}_*` | {f['total']} | {f['certified']} | {rest} |"
        )
    lines += [
        f"| **total** | **{len(names)}** "
        f"| **{len(names) - len(never)}** | **{len(never)}** |",
        "",
        README_END,
    ]
    return "\n".join(lines)


def render() -> tuple[str, int, int]:
    done, _attempts, cert_round = _entry._certification_state()
    max_round = max(cert_round.values(), default=0)
    names = sorted(REGISTRY)
    never = [n for n in names if n not in done]
    buckets: dict[int, list[str]] = {}
    for n in names:
        if n in done:
            buckets.setdefault(cert_round[n], []).append(n)
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
    return "\n".join(lines), len(never), len(names)


def main() -> None:
    path = os.path.join(HERE, "STATUS.md")
    text = open(path).read()
    block, n_never, n_total = render()
    if BEGIN in text and END in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END) :]
        text = pre + block + post
    else:
        text = block + "\n\n" + text
    open(path, "w").write(text)

    rpath = os.path.join(HERE, "README.md")
    rtext = open(rpath).read()
    rblock = render_readme()
    if README_BEGIN in rtext and README_END in rtext:
        pre = rtext[: rtext.index(README_BEGIN)]
        post = rtext[rtext.index(README_END) + len(README_END) :]
        rtext = pre + rblock + post
    else:
        # First insertion: before the Layout section when present,
        # else appended at end-of-file — a missing anchor must not
        # abort the close script after STATUS.md was already rewritten
        # (round-11 ADVICE: uncaught ValueError left a half-updated
        # close).
        anchor = "\n## Layout"
        idx = rtext.find(anchor)
        if idx >= 0:
            rtext = rtext[:idx] + "\n" + rblock + "\n" + rtext[idx:]
        else:
            rtext = rtext.rstrip("\n") + "\n\n" + rblock + "\n"
    open(rpath, "w").write(rtext)
    print(
        f"cert-debt table regenerated: {n_never}/{n_total} never-sampled, "
        f"{n_total - n_never} certified (STATUS.md + README.md)"
    )


if __name__ == "__main__":
    main()
