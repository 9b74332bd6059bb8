"""Query catalog: print every registered query with its tags, oracle
status, and description — the discoverability surface for the engine.

Usage:
    python tools/list_queries.py            # full catalog
    python tools/list_queries.py dedup      # only queries tagged 'dedup'
    python tools/list_queries.py --names    # names only (scripting)

No SparkSession is started: the registry is plain metadata until a
query's callable is invoked.
"""

from __future__ import annotations

import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def catalog(tag: str | None = None) -> list[dict]:
    from retail_sales_etl_pipeline_spark.plans.registry import load_all

    out = []
    for name, q in sorted(load_all().items()):
        if tag and tag not in q.tags:
            continue
        out.append(
            {
                "name": name,
                "tags": list(q.tags),
                "oracle": "hash-checked" if q.oracle else "rows-only",
                "doc": q.doc,
            }
        )
    return out


def main() -> int:
    args = [a for a in sys.argv[1:]]
    names_only = "--names" in args
    args = [a for a in args if not a.startswith("--")]
    tag = args[0] if args else None

    rows = catalog(tag)
    if not rows:
        print(f"no queries tagged {tag!r}")
        return 1
    if names_only:
        for r in rows:
            print(r["name"])
        return 0
    for r in rows:
        header = f"{r['name']}  [{', '.join(r['tags'])}]  ({r['oracle']})"
        print(header)
        if r["doc"]:
            print(textwrap.fill(r["doc"], width=76, initial_indent="    ",
                                subsequent_indent="    "))
        print()
    print(f"{len(rows)} queries" + (f" tagged {tag!r}" if tag else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
