"""Regenerate PLANS.md: physical-plan audit artifacts.

    python -m gfwspark.plans_dump > PLANS.md

AQE is disabled for the capture so whole-stage-codegen spans (`*(n)`)
are visible in the executed plan string.
"""

from __future__ import annotations

PLAN_QUERIES = (
    "flagship_featurize",
    "asof_join_union",
    "asof_join_auto",
    "equi_join_broadcast",
    "sliding_feature_windows",
    "aligned_windows",
    "bloom_semi_join",
    "sliding_window_refs",
)


def main() -> None:
    from gfwspark import queries
    from gfwspark.session import get_spark

    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    print("# PLANS — physical plan audit artifacts\n")
    print("Captured from the live engine (AQE off so codegen spans are")
    print("visible); regenerate with `python -m gfwspark.plans_dump > PLANS.md`.")
    print("What to look for: ONE Exchange on the flagship fact path, map-side")
    print("caption_tokens/aspect below the union, `*(n)` codegen spans, and")
    print("BroadcastHashJoin for the small dimension.\n")
    for name in PLAN_QUERIES:
        df = queries.all_queries()[name](spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"## {name}\n\n```")
        print(plan[:4000])
        print("```\n")
    spark.stop()


if __name__ == "__main__":
    main()
