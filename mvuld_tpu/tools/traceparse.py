"""Summarize a JAX/TPU profile — per-op device time from the xplane proto.

Usage:
  python -m mvuld_tpu.tools.traceparse <profile-dir-or-xplane.pb>
         [--steps K] [--top N] [--category CAT] [--json OUT]

Finds the ``*.xplane.pb`` under a ``jax.profiler.trace`` output directory
(bench.py writes one when MVULD_PROFILE is set), runs the xprof ``hlo_stats``
converter (installed with tensorboard-plugin-profile; no TF needed), and
prints the top ops by device self time — name, category, ms/step, occurrence
count, GFLOP/s, HBM bandwidth, and boundedness. ``--steps`` divides totals by
the fused-step count so numbers read as ms per optimizer step. ``--category``
filters (e.g. "data formatting" to chase layout copies). ``--json`` also
dumps the full converted table for ad-hoc analysis.

The Chrome trace.json the profiler also writes is host-side only here (the
1M-event cap fills with python frames before any device lane) — the xplane
path is the one that carries the per-fusion device timings. The reference
has no profiling tooling at all; its --throughput mode only timestamps
python iterations (mvuld/main.py:438-455).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys


def find_xplane(path: str) -> str:
    if path.endswith(".pb"):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {path}")
    return hits[-1]        # newest run


def hlo_stats_rows(xplane: str):
    from xprof.convert import raw_to_tool_data as r2t
    data, _mime = r2t.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, (bytes, bytearray)):
        data = data.decode()
    table = json.loads(data)
    cols = [c["label"] for c in table["cols"]]
    idx = {c: n for n, c in enumerate(cols)}
    rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]
    return idx, rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("profile", help="trace dir or *.xplane.pb")
    ap.add_argument("--steps", type=int, default=1,
                    help="fused optimizer steps per traced dispatch "
                         "(totals divided by this → ms/step)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--category", default=None,
                    help="only ops of this HLO category")
    ap.add_argument("--json", default=None, help="dump full table here")
    args = ap.parse_args(argv)

    xplane = find_xplane(args.profile)
    print(f"# {xplane}", file=sys.stderr)
    i, rows = hlo_stats_rows(xplane)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"index": i, "rows": rows}, f)

    K = max(args.steps, 1)
    t = lambda r: (r[i["Total self time (us)"]] or 0)

    cat = collections.Counter()
    for r in rows:
        cat[r[i["HLO op category"]]] += t(r)
    grand = sum(cat.values())
    print(f"device self time: {grand / 1e3 / K:.1f} ms/step")
    for k, v in cat.most_common(12):
        print(f"  {k:32s} {v / 1e3 / K:9.2f} ms {v / grand:6.1%}")

    if args.category:
        rows = [r for r in rows if r[i["HLO op category"]] == args.category]
    rows.sort(key=lambda r: -t(r))
    print(f"\n{'op':34s} {'category':18s} {'ms/step':>8s} {'n':>5s} "
          f"{'GF/s':>7s} {'HBM GiB/s':>9s} {'bound':>8s}")
    for r in rows[:args.top]:
        print(f"{str(r[i['HLO op name']])[:34]:34s} "
              f"{str(r[i['HLO op category']])[:18]:18s} "
              f"{t(r) / 1e3 / K:8.2f} {int(r[i['#Occurrences']] or 0):5d} "
              f"{(r[i['Model GFLOP/s']] or 0):7.0f} "
              f"{(r[i['Measured memory BW (GiB/s)']] or 0):9.1f} "
              f"{str(r[i['Bound by']])[:8]:>8s}")


if __name__ == "__main__":
    main()
