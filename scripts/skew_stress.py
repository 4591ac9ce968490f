"""r6 (VERDICT task 5): measure — don't assert — the skew-safety of
the two shuffle-joining pipeline operators under an ADVERSARIALLY hot
key at sf10.

Corpus: 100 id-shifted, word-salted replicas of the sf0.1 documents
table (500k docs), every document PREFIXED with the same unsalted
8-word boilerplate line. That makes:
- ONE dedup_segments segment key carrying 500,000 occurrences (the
  first 8-word segment of every document) — the C4 boilerplate-line
  regime the two-phase shape exists for;
- the prefix's word bigrams 500k-frequency LM-join keys (the
  stop-word-bigram skew regime for score_documents' ngram join).

Measurement: per-stage task-time quantiles from the Spark UI REST API
(executorRunTime p50 / max over every multi-task stage of the job),
with AQE skew-join ON and OFF. The claim under test — recorded in
bench_results/skew_sf10_r6.json and BENCH_NOTES.md — is that with the
shipped defaults no reducer straggles >4x the stage median: the
dedup_segments partial agg collapses the hot segment map-side, the
join-back is AQE-splittable (unlike the r1 window formulation), and
the LM score join's hot ngram partitions split the same way.

AQE's skew splitter only fires above size thresholds meant for
cluster-scale partitions, so the run lowers them (factor 2 / 16 MB
threshold / 8 MB advisory) to make the 150 MB corpus exercise the
same code path a 100 TB corpus would hit with the shipped defaults
(factor 5 / 256 MB); the artifact records the overrides.

Usage: python scripts/skew_stress.py [corpus_dir] [out_json]
       (builds the corpus on first run; ~170 MB under /tmp)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SRC = "/root/testdata/sf0.1"
HOT = "the quick brown fox jumps over lazy dogs"  # exactly 8 words


def build_corpus(dst: str) -> None:
    from make_sf1 import scale_table

    os.makedirs(dst, exist_ok=True)
    n = scale_table(SRC, dst, "documents", replicas=100, hot_prefix=HOT)
    print(f"skew corpus: {n} documents at {dst}")


def stage_summaries(spark) -> list[dict]:
    """Task-time quantiles for every completed multi-task stage, via
    the UI REST API (the only place per-task durations surface without
    a JVM listener)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    out = []
    for s in stages:
        if s.get("numCompleteTasks", 0) < 4:
            continue
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/"
                f"{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0"
            ) as r:
                q = json.load(r)
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        rr = q.get("shuffleReadMetrics", {}).get("readRecords", [0, 0])
        out.append({
            "stage_id": s["stageId"],
            "name": s.get("name", "")[:80],
            "num_tasks": s["numCompleteTasks"],
            "shuffle_read_mb": round(
                s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_read_records": s.get("shuffleReadRecords", 0),
            "input_records": s.get("inputRecords", 0),
            "task_shuffle_records_median": rr[0],
            "task_shuffle_records_max": rr[-1],
            "task_ms_median": med,
            "task_ms_max": mx,
            "max_over_median": round(mx / med, 2) if med else None,
        })
    return out


def run_case(spark, corpus: str, op: str, skew_join: bool) -> dict:
    import pyspark.sql.functions as F

    from locustdb_spark.operators.dedup import dedup_segments
    from locustdb_spark.operators.lm import ngram_counts, score_documents

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                   str(skew_join).lower())
    spark.catalog.clearCache()
    before = {s["stage_id"] for s in stage_summaries(spark)}
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    t0 = time.monotonic()
    if op == "dedup_segments":
        out = dedup_segments(docs)
        n = out.agg(F.sum("n_kept")).collect()[0][0]
    else:
        # model trained on replica 0 only (a realistic reference
        # corpus); scoring joins ALL 500k docs' bigrams against it
        # through the non-broadcast shuffle path under test. The
        # checksum MUST depend on the model side: summing n_ngrams
        # alone lets Catalyst eliminate the left join outright (right
        # side unused, left-join row count preserved) — the first r6
        # run measured a join that never executed.
        model = ngram_counts(docs.filter("doc_id < 1000000"))
        out = score_documents(docs, model, broadcast_model=False)
        n = out.agg(F.sum(F.col("seen_cnt_sum")
                          + F.col("n_unseen"))).collect()[0][0]
    wall = time.monotonic() - t0
    stages = [s for s in stage_summaries(spark)
              if s["stage_id"] not in before]
    # The straggler metric is computed over REDUCER stages — stages
    # whose dominant work is shuffle consumption (>=1M records read).
    # Local-mode stages that fuse a reduce with an unrelated map
    # branch (e.g. a union leg's scan) mix task populations, and a
    # map-vs-reduce duration gap there is not key skew. (Exactly that
    # fusion produced the r6 first-cut's apparent 447x: the LM
    # empties branch re-scanning the corpus inside the final stage —
    # fixed in lm.py by making the empties filter a token count.)
    reducers = [s for s in stages
                if s["shuffle_read_records"] >= 1_000_000]
    worst = max((s for s in reducers),
                key=lambda s: s["max_over_median"] or 0,
                default=None)
    return {
        "op": op,
        "aqe_skew_join": skew_join,
        "wall_s": round(wall, 1),
        "checksum": int(n),
        "worst_reducer_stage": worst,
        "stages": stages,
    }


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew_sf10"
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "bench_results/skew_sf10_r6.json")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        build_corpus(corpus)

    from locustdb_spark import get_spark

    overrides = {
        # scale AQE's skew thresholds down to the corpus so the
        # splitter exercises at 150 MB what it would at 100 TB with
        # the shipped 256 MB defaults
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        # force the model join to a real shuffle SMJ: at 100 TB the
        # LM model (billions of n-grams) does NOT broadcast, and the
        # hot stop-word-bigram partitions of the PROBE (grams) side
        # are the skew under test — with any broadcastable model the
        # join is map-side and skew-immune, which is the easy case.
        # Both the static and the AQE-runtime thresholds must be off.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    spark = get_spark(app_name="skew-stress", extra_conf=overrides)
    results = []
    for op in ("dedup_segments", "text_lm_score"):
        for skew in (True, False):
            r = run_case(spark, corpus, op, skew)
            w = r["worst_reducer_stage"]
            print(f"{op} skewJoin={skew}: wall {r['wall_s']}s, worst "
                  f"shuffle stage max/median = "
                  f"{w['max_over_median'] if w else 'n/a'}")
            results.append(r)
    # checksums must not depend on the AQE setting
    for op in ("dedup_segments", "text_lm_score"):
        cs = {r["checksum"] for r in results if r["op"] == op}
        assert len(cs) == 1, f"{op} results differ across AQE: {cs}"
    artifact = {
        "corpus": {"docs": 500_000, "replicas": 100,
                   "hot_prefix_words": 8,
                   "hot_segment_occurrences": 500_000},
        "conf_overrides": overrides,
        "runs": results,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
