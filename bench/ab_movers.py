"""Controlled same-window A/B for per-query bench movers.

Round-over-round pack timings on this box drift up to ~2x between
sessions (documented in BENCH/BASELINE.md), so a r02-vs-r03 delta on
its own cannot distinguish a code regression from box state. This
harness removes the session variable: it alternates SUBPROCESS runs of
the two code trees (old snapshot vs HEAD) A,B,A,B,... minutes apart in
one window, each run a fresh local[N] session that executes the query
once cold and twice steady (best steady kept), and reports the
side-by-side best-of-rounds.

Usage:
    python bench/ab_movers.py <old_tree> <query> [<query> ...]
    # e.g. python bench/ab_movers.py .ab_r02 dedup_minhash_lsh text_fingerprints
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROUNDS = 3
RUNNER = r"""
import json, os, sys, time
side = sys.argv[1]
name = sys.argv[2]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sys.path.insert(0, side)
os.chdir(side)
from nreadability_spark.session import get_spark
spark = get_spark(master=f"local[{cpus}]", app_name="ab-movers",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
import importlib.util as u
spec = u.spec_from_file_location("entry_ab", os.path.join(side, "__spark_entry__.py"))
m = u.module_from_spec(spec); spec.loader.exec_module(m)
fn = m.queries()[name]
spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
def run():
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0
cold = run()
steady = min(run(), run())
print(json.dumps({"side": side, "query": name, "cold": round(cold, 3),
                  "steady": round(steady, 3)}))
spark.stop()
"""


def main():
    old_tree = os.path.abspath(sys.argv[1])
    queries = sys.argv[2:]
    head = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "head": []} for q in queries
    }
    for rnd in range(ROUNDS):
        for label, tree in (("old", old_tree), ("head", head)):
            for q in queries:
                out = subprocess.run(
                    [sys.executable, "-c", RUNNER, tree, q],
                    capture_output=True, text=True, check=False,
                )
                line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    print(f"round {rnd} {label} {q}: FAILED\n{out.stderr[-800:]}")
                    continue
                results[q][label].append(r["steady"])
                print(f"round {rnd} {label:4s} {q}: cold={r['cold']} steady={r['steady']}")
    print()
    for q in queries:
        o, h = results[q]["old"], results[q]["head"]
        print(json.dumps({
            "query": q,
            "old_steady_best": min(o) if o else None,
            "head_steady_best": min(h) if h else None,
            "old_all": o, "head_all": h,
        }))


if __name__ == "__main__":
    main()
