"""Generate CATALOG.md from the live query registry.

One row per registered query: name, driver-gate status this round,
oracle kind, tags, and the first docstring sentence. Regenerate with
``python tools/gen_catalog.py``; ``tests/test_catalog.py`` pins the
committed file equal to a fresh render so the table can't drift from
the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all  # noqa: E402
from sparkstreaming_gmall_scala_spark.plans.rotation import POOL  # noqa: E402


def first_sentence(doc: str) -> str:
    flat = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in flat:
            return flat[: flat.index(stop) + 1]
    return flat[:160]


def render() -> str:
    reg = load_all()
    lines = [
        "# Query catalog",
        "",
        "Auto-generated from the live registry by `tools/gen_catalog.py` "
        "(pinned current by `tests/test_catalog.py`). Gate status reflects "
        "THIS round's rotation window over the pool in "
        "`plans/rotation.py`; every pool name cycles into the driver's "
        "50-row correctness gate within `ceil(len(POOL)/6)` rounds.",
        "",
        f"{len(reg)} queries; {sum(1 for q in reg.values() if q.gated)} "
        f"gated this round; "
        f"{sum(1 for q in reg.values() if q.oracle is not None)} with full "
        "DuckDB oracles; rotation pool of "
        f"{len(POOL)}.",
        "",
        "| Query | Gate | Oracle | Tags | What |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(reg):
        q = reg[name]
        if q.gated:
            gate = "gated"
        elif name in POOL:
            gate = "pool"
        else:
            gate = "—"
        oracle = "full" if q.oracle is not None else "rows-only"
        tags = " ".join(q.tags)
        doc = first_sentence(q.doc).replace("|", "\\|")
        lines.append(f"| `{name}` | {gate} | {oracle} | {tags} | {doc} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")
