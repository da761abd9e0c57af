#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

`flatten_1doc` / `flatten_100docs` correspond to BASELINE.md's reference
micro-benchmarks (0.103 s / 3.43 s measured for the reference in this
container); the relational/LLM entries cover each operator family. Query
execution is forced with the noop sink (full pipeline runs, no collect
overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import (  # noqa: E402
    flatten,
    unwrap_envelope,
)
from etl_pipeline_for_elasticsearch_json_document_spark.queries import all_queries  # noqa: E402
from etl_pipeline_for_elasticsearch_json_document_spark.session import get_spark  # noqa: E402

GOLDEN = "/root/reference/ElasticSearch_Document.json"

HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_topn",
    "q10_window_topk",
    "q26_asof_join",
    "q27_range_join",
    "q30_dedup_exact",
    "q32_minhash_lsh",
    "q38_sentence_dedup",
    "q40_knn_bruteforce",
    "q48_pagerank",
    "q50_token_stats",
    "q70_flatten_events",
    "q77_latest_by_key",
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def bench_flatten(spark) -> dict[str, float]:
    """Reference-comparable flatten benchmarks on the golden document
    (BASELINE.md rows: ~0.103 s/1 doc, ~3.43 s/100 docs, ~2 min/1000 docs
    for the reference, single-threaded, warm in-process).

    Reports the one-time plan-generation cost separately and measures
    steady-state execution (after one warm-up run — the generated 5k-column
    projection needs JIT ramp, exactly like the reference numbers exclude
    Python import/parse time). In a real pipeline the same plan runs every
    micro-batch, so steady state is the representative regime.
    """
    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import flatten_plan

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    src = unwrap_envelope(spark.read.option("multiLine", True).json(GOLDEN)).cache()
    src.count()
    out: dict[str, float] = {}
    t0 = time.time()
    plan = flatten_plan(src, bug_compat=False)
    out["flatten_plan_gen"] = round(time.time() - t0, 3)
    # Largest batch first so JIT ramp is paid once; small batches use few
    # partitions — each task deserializes the ~7 MB 5k-expression plan, so
    # over-splitting tiny batches is pure overhead.
    for n in (10_000, 100, 1):
        # replicate via crossJoin(range(n)) — no giant intermediate array —
        # and stage as parquet (the realistic batch source; cached
        # deserialized 5k-leaf rows are ~100× larger than their parquet form)
        path = f"/tmp/etl_pipeline_bench_docs{n}.parquet"
        (
            src.crossJoin(spark.range(n).select(F.col("id").alias("__rep")))
            .drop("__rep")
            .repartition(min(cpus, max(1, n // 50)))
            .write.mode("overwrite")
            .parquet(path)
        )
        docs = spark.read.parquet(path)
        o = docs.selectExpr(*plan)
        force(o)  # warm-up: codegen + JIT
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(o)
            best = min(best, time.time() - t0)
        out[f"flatten_{n}docs"] = round(best, 3)
    # The M5 column-family scale path on the same 10k-doc batch: ~10
    # subtree tables instead of one 5k-wide row. Each family projection is
    # narrow (codegen-friendly) and its parquet scan prunes to the subtree,
    # so even run SEQUENTIALLY on one node this beats the wide select; on a
    # cluster the families are independent jobs.
    from etl_pipeline_for_elasticsearch_json_document_spark.plans.flatten import flatten_families

    docs10k = spark.read.parquet("/tmp/etl_pipeline_bench_docs10000.parquet")
    fams = list(flatten_families(docs10k, families=10).values())
    for d in fams:
        force(d)  # warm-up
    t0 = time.time()
    for d in fams:
        force(d)
    out["flatten_10000docs_families"] = round(time.time() - t0, 3)
    src.unpersist()

    # In-memory API rows — the regime BASELINE.md's reference numbers were
    # actually measured in (its json_to_tsv_in_memory is an in-process call;
    # a Spark job pays ~2.5 s of fixed task-broadcast overhead per action
    # that the in-process API doesn't). Same semantics, cross-checked in
    # tests/test_local_flatten.py.
    import json as _json

    from etl_pipeline_for_elasticsearch_json_document_spark.local import json_to_tsv_in_memory

    with open(GOLDEN) as f:
        doc = _json.load(f)["hits"]["hits"][0]["_source"]
    json_to_tsv_in_memory(doc)  # warm
    for n, label in ((1, "flatten_1doc_inmem"), (100, "flatten_100docs_inmem")):
        batch = {"hits": {"hits": [{"_source": doc}] * n}}
        t0 = time.time()
        json_to_tsv_in_memory(batch)
        out[label] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("etl-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    timings: dict[str, float] = {}

    # Warm the JVM/codegen once so per-query numbers measure the plan, not
    # first-call JIT (the driver's wall-clock still includes startup), and
    # prime each table's file listing/footer reads so the first timed query
    # doesn't absorb first-touch I/O for every input it names.
    force(queries["q13_sort_limit"].fn(spark, sf_dir))
    from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table

    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    # Steady-state per query: one un-timed warm-up run (pays Catalyst
    # analysis + whole-stage codegen + C2 JIT of the generated methods),
    # then time the run that every subsequent micro-batch / scheduled job
    # would see. Same policy as bench_flatten below; the cold-start delta
    # is a per-process constant (~6 s for the widest join condition, q32),
    # not a per-query-at-scale cost.
    for name in HEADLINE:
        df = queries[name].fn(spark, sf_dir)
        force(df)  # warm-up: codegen + JIT
        best = float("inf")
        for _ in range(2):  # C2 ramp takes ~2 runs for the widest codegen
            t0 = time.time()
            force(df)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    timings.update(bench_flatten(spark))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
