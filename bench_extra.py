"""Per-query measurement harness for the optimization round (guide §1).

``bench.py`` is frozen for measurement, so isolation runs live here:
each named query is built from ``__spark_entry__.queries()`` and timed at
the noop sink (computes every column, discards the result — §1.4), with
jobs labelled for the UI (§1.5) and optional ``.explain("formatted")``
capture for plans/r06/.

Usage:
  python bench_extra.py [-n REPEATS] [--explain OUTDIR] [--suffix S] [q ...]

Reads $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like bench.py.
Prints one JSON line: {"queries": {name: [s, ...]}, "min": {name: s}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from htrc_feature_reader_spark import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("-n", type=int, default=1, help="repeats per query")
    ap.add_argument("--explain", default=None,
                    help="directory for <query><suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for explain dumps (_before/_after)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=2 * cpus)
    qs = entrymod.queries()
    names = args.names or HEADLINE

    samples: dict[str, list[float]] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain,
                                   f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        samples[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps({
        "sf_dir": sf_dir,
        "queries": samples,
        "min": {k: min(v) for k, v in samples.items()},
        "total_min": round(sum(min(v) for v in samples.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
