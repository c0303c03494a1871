"""Dump `.explain("formatted")` for the round-15-touched queries into
/root/repo/plans/r15/<query>_<tag>.txt  (tag = before|after).

Usage: python scripts/dump_r15_plans.py <tag> [query ...]
Run from the repo root whose code should produce the plans (the r14
worktree for "before", the working tree for "after"); output always
lands in /root/repo/plans/r15/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

OUT_DIR = "/root/repo/plans/r15"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: queries touched this round (kept in sync with OPTIMIZATION_r15.md)
DEFAULT = [
    # pack_budget checkpoint-free two-phase cumsum
    "pipeline_e2e_curation",
    "pipeline_pack_budget",
    # lake certificate read/maintenance surgery (driver-action wins; the
    # returned-frame plans prove result shape unchanged)
    "lake_manifest_read",
    "lake_manifest_bloom_read",
    "lake_bloom_pruned_read",
    "lake_zone_refresh_read",
    "lake_bloom_refresh_read",
    "lake_pruned_read",
    "lake_pruned_semi_read",
    "lake_semi_snapshot_keys",
    "lake_manifest_diff",
    "lake_compact_refresh_read",
    # gopher SQL spelling (identical trees, cheaper build)
    "pipeline_modern_recipe",
    "text_gopher_rules",
    # similarity SQL spellings + arrow matrix frame (PythonRDD ->
    # LocalTableScan on the broadcast side)
    "embedding_topk",
    "embedding_semantic_dedup",
    "embedding_lsh_topk",
    "embedding_label_propagation",
    "embedding_hard_negatives",
    "embedding_pca_project",
    "embedding_margin_mining",
    "embedding_sq_recall",
    # threshold_sweep / ngram-LM SQL + fan-out
    "pipeline_model_quality_recipe",
    "text_lm_bigram_nll",
    "pipeline_threshold_sweep",
]


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)

    from pdtable_spark.session import get_session

    spark = get_session("r15-plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    from pdtable_spark.operators import dedup
    from pdtable_spark.queries.suite import QUERIES, load

    Q = dict(QUERIES)
    Q["minhash_candidates"] = lambda s, d: dedup.minhash_dedup(
        load(s, d, "documents"), num_hashes=16, bands=4, jaccard_threshold=0.5
    )
    for mod in ("pending_r9", "pending_r10", "pending_r11", "pending_r12",
                "pending_r13", "pending_r14"):
        try:
            m = __import__(f"pdtable_spark.queries.{mod}", fromlist=["*"])
        except Exception:
            continue
        for attr in dir(m):
            if attr.startswith("PENDING_") or attr.endswith("_QUERIES"):
                for name, val in getattr(m, attr, {}).items():
                    fn = val[0] if isinstance(val, tuple) else val
                    Q.setdefault(name, fn)

    for name in names:
        df = Q[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
