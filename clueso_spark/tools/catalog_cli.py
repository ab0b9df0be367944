"""Catalog listing: every registered query, its oracle status and tags.

Usage: python -m clueso_spark.tools.catalog_cli [tag]
"""

from __future__ import annotations

import sys


def main() -> int:
    from clueso_spark.plans.catalog import all_queries

    tag = sys.argv[1] if len(sys.argv) > 1 else None
    rows = [
        (name, "sql-oracle" if cq.oracle else "rows-only", ",".join(cq.tags))
        for name, cq in sorted(all_queries().items())
        if tag is None or tag in cq.tags
    ]
    width = max(len(r[0]) for r in rows)
    for name, oracle, tags in rows:
        print(f"{name:<{width}}  {oracle:<10}  {tags}")
    print(f"\n{len(rows)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
