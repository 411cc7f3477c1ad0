#!/usr/bin/env python3
"""Elementwise-min merge of bench artifacts (dev tooling, not library
code) — the 30x stress protocol fix from round 4: a single in-JVM run
at 30x can carry contention pathology on an arbitrary subset of
entries (trivially-linear scans showed 12-22x super-linear in the
committed round-4 artifact while the within-run canary stayed quiet).
Contention only ever ADDS time, so the elementwise minimum across >=2
isolated fresh-JVM runs is always the honest estimate.

Usage: python3 minmerge.py OUT.json RUN1.json RUN2.json [RUN3.json ...]

Every query present in ANY run is kept (a failed entry in one run must
not drop the other run's honest number); `value` is recomputed as the
sum of merged per-query seconds; `noisy`/`regressed` are the
intersection across runs (an entry flagged in every independent run is
a real signal, one flagged in a single run was that run's contention);
`stream_state` and `sf` come from the first run; `merged_from` records
the per-run totals for the audit trail.

Minima are DATE-STAMPED (`stamps`): a query's stamp is today when its
min came from one of today's run files, else it carries forward from
the existing artifact being folded. Bench's cross-run canary reads the
stamps and RELAXES the 2x regression threshold to 3x for minima older
than 14 days — a historical best the current box can't reproduce
(cross-round minimum ratchet, SURVEY §6) ages into a softer bar
instead of generating a phantom `regressed` flag every round.
"""
import datetime
import json
import sys


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"refusing to merge different scales: {sfs}")
    merged = {}
    stamps = {}
    today = datetime.date.today().isoformat()
    for r in runs:
        # an input with its own stamps is a previously-merged artifact:
        # its minima keep their original dates; a raw run stamps today
        r_stamps = r.get("stamps", {})
        for q, v in r.get("queries", {}).items():
            if q not in merged or v < merged[q]:
                merged[q] = v
                stamps[q] = r_stamps.get(q, today)
    noisy = set(runs[0].get("noisy", []))
    regressed_keys = set(runs[0].get("regressed", {}))
    for r in runs[1:]:
        noisy &= set(r.get("noisy", []))
        regressed_keys &= set(r.get("regressed", {}))
    out = {
        "metric": "total",
        "value": sum(merged.values()),
        "unit": "sec",
        "queries": merged,
        "stamps": stamps,
        # union across runs, first-found wins: an entry added to the
        # bench surface mid-round only exists in later runs and must
        # not lose its bounded-state evidence to run order
        "stream_state": {
            k: v
            for r in reversed(runs)
            for k, v in r.get("stream_state", {}).items()
        },
        "noisy": sorted(noisy),
        "regressed": {k: runs[0]["regressed"][k] for k in sorted(regressed_keys)},
        "sf": runs[0].get("sf"),
        "merged_from": [
            {"path": p, "total": r.get("value")}
            for p, r in zip(run_paths, runs)
        ],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"merged {len(run_paths)} runs -> {out_path}: "
          f"{len(merged)} queries, total {out['value']:.1f}s")


if __name__ == "__main__":
    main()
