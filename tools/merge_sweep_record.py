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
  python tools/merge_sweep_record.py --from-raw OUT.json RAW.jsonl EDGES VERTICES

BASE.json: a full bench document (the final fraction's stdout JSON or
BENCH/latest_full.json) providing edges/vertices/batches metadata.
Each LOG_OR_JSON: either another full document or a raw stderr log containing
`# sweep <frac>: {...}` lines (parsed with ast.literal_eval — the dicts are
printed with Python repr).

--from-raw builds the whole record from the per-batch JSONL sidecar
(SPARK_GRAFT_SWEEP_RAW) instead of run logs: a killed campaign never prints
its `# sweep` summary line or latest_full.json, but every completed batch IS
in the sidecar, so the medians/speedups are recomputed here with exactly the
aggregation bench.py uses (median over batches of sum(superstep_seconds)).
Per-fraction batch counts may differ (a campaign cut short records what ran);
each by_fraction row carries its own honest "batches" count and
batches_per_fraction becomes the per-fraction map.
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


def record_from_raw(raw_path: str, edges: int, vertices: int) -> dict:
    """Recompute the by_fraction summary rows from the per-batch sidecar.

    Mirrors bench.py section_dynamic_sweep's aggregation exactly: per
    technique, the median over batches of sum(superstep_seconds); speedup =
    static median / technique median; iterations = median; err = max L∞
    across all batches vs that batch's fresh static recompute.
    """
    import statistics

    per: dict = {}
    for line in open(raw_path):
        row = json.loads(line)
        bucket = per.setdefault(
            row["frac"],
            {t: [] for t in ("static", "nd", "df", "dfp")} | {"_iters": {}, "_errs": []},
        )
        for t in ("static", "nd", "df", "dfp"):
            bucket[t].append(row["per"][t])
            bucket["_iters"].setdefault(t, []).append(row["iters"][t])
        bucket["_errs"].extend(row["errs"])
    by_fraction = {}
    for frac in sorted(per, key=float):
        b = per[frac]
        med = {t: statistics.median(b[t]) for t in ("static", "nd", "df", "dfp")}
        by_fraction[frac] = {
            "batch_size": max(int(float(frac) * edges), 5),
            "batches": len(b["static"]),
            "static_med_loop_sec": round(med["static"], 4),
            "nd_med_loop_sec": round(med["nd"], 4),
            "df_med_loop_sec": round(med["df"], 4),
            "dfp_med_loop_sec": round(med["dfp"], 4),
            "nd_speedup_vs_static": round(med["static"] / max(med["nd"], 1e-9), 2),
            "df_speedup_vs_static": round(med["static"] / max(med["df"], 1e-9), 2),
            "dfp_speedup_vs_static": round(med["static"] / max(med["dfp"], 1e-9), 2),
            "iterations_med": {
                t: float(statistics.median(b["_iters"][t]))
                for t in ("static", "nd", "df", "dfp")
            },
            "max_err_linf": max(b["_errs"]) if b["_errs"] else None,
        }
    return {
        "metric": "dynamic_sweep_from_raw_sidecar",
        "unit": "sec",
        "raw_sidecar": raw_path,
        "dynamic_sweep": {
            "edges": edges,
            "vertices": vertices,
            "batches_per_fraction": {f: r["batches"] for f, r in by_fraction.items()},
            "loop_metric": "median over batches of sum(superstep_seconds)",
            "by_fraction": by_fraction,
        },
    }


def main() -> int:
    if sys.argv[1] == "--from-raw":
        out_path, raw_path, edges, vertices = sys.argv[2:6]
        rec = record_from_raw(raw_path, int(edges), int(vertices))
        with open(out_path, "w") as fh:
            json.dump(rec, fh, indent=1)
            fh.write("\n")
        bf = rec["dynamic_sweep"]["by_fraction"]
        print(f"{out_path}: " + ", ".join(f"{f}×{r['batches']}" for f, r in bf.items()))
        return 0
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
