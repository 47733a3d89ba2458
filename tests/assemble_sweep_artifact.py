"""Assemble a committed sweep artifact from a sweep state file, with
the explicit denominator/exclusion header VERDICT-r8 task 10 requires.

Usage:
  python tests/assemble_sweep_artifact.py STATE_FILE OUT_FILE SF_LABEL \
      [--all]   # denominator includes lakehouse_/stream_ prefixes
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    state, out_path, sf_label = sys.argv[1], sys.argv[2], sys.argv[3]
    include_all = "--all" in sys.argv[4:]

    from ducklakexl_spark import queries as qmod

    qmod.load_all()
    denom = sorted(qmod.ORACLES)
    excl = []
    if not include_all:
        excl = [n for n in denom if n.startswith(("lakehouse_", "stream_"))]
        denom = [n for n in denom if n not in excl]

    rows = {}
    for line in open(state):
        line = line.strip()
        if not line:
            continue
        name, _, status = line.partition(" ")
        rows[name] = status  # last occurrence wins (retries append)

    ok = sorted(n for n in denom if rows.get(n, "").startswith("OK"))
    skip = sorted(n for n in denom if rows.get(n, "").startswith("SKIP"))
    bad = sorted(
        n
        for n in denom
        if n in rows and not rows[n].startswith(("OK", "SKIP"))
    )
    missing = sorted(n for n in denom if n not in rows)

    with open(out_path, "w") as f:
        f.write(
            f"# full-registry strict sweep at {sf_label} "
            f"(harness: tests/sweep_sf.py + tests/compare.py — rows+dtypes+value hash vs DuckDB)\n"
        )
        f.write(
            f"# denominator: {len(denom)} registry queries"
            + (
                f" (registry {len(denom) + len(excl)}; excluded prefixes"
                f" lakehouse_/stream_: {len(excl)} stateful rows — covered"
                f" by the all-registry sf0.01 tier SWEEP_all258_sf001_r9.txt)"
                if excl
                else " (no exclusions)"
            )
            + "\n"
        )
        f.write(
            f"# result: {len(ok)} OK, {len(skip)} documented SKIP, "
            f"{len(bad)} ERROR/MISMATCH, {len(missing)} not reached\n"
        )
        for n in denom:
            if n in rows:
                f.write(f"{n} {rows[n]}\n")
            else:
                f.write(f"{n} NOT-REACHED\n")
    print(
        f"{out_path}: {len(ok)} OK / {len(skip)} SKIP / {len(bad)} bad /"
        f" {len(missing)} missing of {len(denom)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
