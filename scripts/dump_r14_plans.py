"""Dump `.explain("formatted")` for the round-14-touched queries into
/root/repo/plans/r14/<query>_<tag>.txt  (tag = before|after).

Usage: python scripts/dump_r14_plans.py <tag> [query ...]
Run from the repo root whose code should produce the plans (the r13
clone for "before", the working tree for "after"); output always lands
in /root/repo/plans/r14/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

OUT_DIR = "/root/repo/plans/r14"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: queries touched this round (kept in sync with OPTIMIZATION_r14.md)
DEFAULT = [
    "minhash_candidates",
    "text_fingerprint",
    "dedup_skewed_buckets",
    "pipeline_e2e_curation",
    "pipeline_modern_recipe",
    "pipeline_pack_budget",
    "embedding_margin_agreement",
    "embedding_label_propagation",
    "embedding_hard_negatives",
    "embedding_semantic_dedup",
    "embedding_topk",
    "embedding_gram_ledger",
    "embedding_margin_mining",
    "multimodal_image_meta",
    "multimodal_video_meta",
    "pipeline_bloom_screen",
    "pipeline_json_profile",
    "lake_hilbert_cells",
    "text_collocations",
    "text_tfidf_keywords",
    "dedup_winnow_pairs",
    "dedup_containment_pairs",
    "pipeline_dsir_weights",
]


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)

    from pdtable_spark.session import get_session

    spark = get_session("r14-plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    from pdtable_spark.operators import dedup
    from pdtable_spark.queries.suite import QUERIES, load

    Q = dict(QUERIES)
    # the bench's production-hash minhash spelling (the headline cell)
    Q["minhash_candidates"] = lambda s, d: dedup.minhash_dedup(
        load(s, d, "documents"), num_hashes=16, bands=4, jaccard_threshold=0.5
    )
    for mod in ("pending_r9", "pending_r10", "pending_r11", "pending_r12",
                "pending_r13", "pending_r14"):
        try:
            m = __import__(f"pdtable_spark.queries.{mod}", fromlist=["*"])
        except Exception:
            continue
        key = "PENDING_" + mod.split("_r")[-1].upper().replace("R", "R")
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
