"""Merge per-fraction dynamic-sweep results into one bench record.

A multi-hour sweep campaign runs fraction-by-fraction (SPARK_GRAFT_SWEEP_FRACS,
with the SPARK_GRAFT_SWEEP_RAW per-batch sidecar for kill-resume); each run
prints its `# sweep <frac>: {...}` dict to stderr and writes the full document
to BENCH/latest_full.json.  This tool stitches the by_fraction dicts from N
such run logs / documents into one record shaped like a single uninterrupted
`SPARK_GRAFT_BENCH_SECTIONS=sweep` run, so tools/gen_bench_report.py can
consume it unchanged.

Usage:
  python tools/merge_sweep_record.py OUT.json BASE.json LOG_OR_JSON...

BASE.json: a full bench document (the final fraction's stdout JSON or
BENCH/latest_full.json) providing edges/vertices/batches metadata.
Each LOG_OR_JSON: either another full document or a raw stderr log containing
`# sweep <frac>: {...}` lines (parsed with ast.literal_eval — the dicts are
printed with Python repr).
"""

from __future__ import annotations

import ast
import json
import re
import sys

SWEEP_LINE = re.compile(r"# sweep (\S+): (\{.*\})")


def fractions_from(path: str) -> dict:
    text = open(path, errors="replace").read()
    out: dict = {}
    try:
        doc = json.loads(text)
        sweep = doc.get("dynamic_sweep") or doc.get("full_document", {})
        if isinstance(sweep, dict) and "by_fraction" in sweep:
            out.update(sweep["by_fraction"])
            return out
    except (json.JSONDecodeError, AttributeError):
        pass
    for m in SWEEP_LINE.finditer(text):
        out[m.group(1)] = ast.literal_eval(m.group(2))
    return out


def main() -> int:
    out_path, base_path, *rest = sys.argv[1:]
    base = json.load(open(base_path))
    sweep = base.get("dynamic_sweep")
    if sweep is None:
        raise SystemExit(f"{base_path} has no dynamic_sweep section")
    for p in rest:
        got = fractions_from(p)
        if not got:
            raise SystemExit(f"no sweep fractions found in {p}")
        for frac, row in got.items():
            sweep["by_fraction"].setdefault(frac, row)
    sweep["by_fraction"] = dict(
        sorted(sweep["by_fraction"].items(), key=lambda kv: float(kv[0]))
    )
    with open(out_path, "w") as fh:
        json.dump(base, fh, indent=1)
        fh.write("\n")
    print(f"{out_path}: fractions {list(sweep['by_fraction'])}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
