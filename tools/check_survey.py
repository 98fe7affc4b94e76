#!/usr/bin/env python3
"""SURVEY §2 superset gate: every query name in `SparkEntry.queries`
must be cited by at least one §2 inventory row (the checklist the judge
walks line by line must never undercount the shipped surface — r10
shipped three green queries with no row).

Usage: python3 tools/check_survey.py   (from the repo root)
Exit 1 if any query is missing from §2.
"""
import re
import sys

ENTRY = "src/main/scala/graft/SparkEntry.scala"
SURVEY = "SURVEY.md"


def main() -> int:
    src = open(ENTRY).read()
    # keys of the queries map: "q_name" -> (...)
    queries = set(re.findall(r'"(q_[a-z0-9_]+)"\s*->', src))
    if not queries:
        print("no queries parsed from SparkEntry — parser broken?")
        return 2

    text = open(SURVEY).read()
    s2 = text.split("## §2", 1)[1].split("\n## ", 1)[0]
    cited = set(re.findall(r"q_[a-z0-9_]+", s2))

    missing = sorted(queries - cited)
    if missing:
        for q in missing:
            print(f"MISSING from SURVEY §2: {q}")
        print(f"== {len(missing)} of {len(queries)} queries have no §2 row ==")
        return 1
    print(f"== SURVEY §2 is a superset: all {len(queries)} queries cited ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
