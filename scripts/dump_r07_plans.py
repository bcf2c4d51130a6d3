"""Dump explain('formatted') for every round-7-touched query into
plans/r07/<query>_<tag>.txt. Run once from the round-start worktree
(tag=before) and once from the optimized tree (tag=after):

    python scripts/dump_r07_plans.py <repo_root> <tag> <out_dir>
"""

from __future__ import annotations

import os
import sys

ROOT, TAG, OUT = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, ROOT)

TOUCHED = (
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "near_dup_groups",
    "simhash_near_dups",
    "phash_near_dups",
    "match_documents",
    "curate_corpus",
    "real_decode_features",
)


def main() -> None:
    from perl_data_validate_sanctions_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark(app_name=f"plans-r07-{TAG}", cores="8")
    os.makedirs(OUT, exist_ok=True)
    qs = em.queries()
    sf = "/root/testdata/sf0.01"
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    def dump(name: str, df) -> None:
        plan = df._jdf.queryExecution().explainString(fmt)
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(name, TAG, "ok")

    for name in TOUCHED:
        dump(name, qs[name](spark, sf))

    # the pair operators localCheckpoint their result (the declared
    # query's plan is then just the checkpoint scan) — dump the LAZY
    # compute plans too, which is where the round-7 restructures live
    from pyspark.sql import functions as F

    from perl_data_validate_sanctions_spark.operators import dedup

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    dump("ngram_jaccard_pairs_lazy",
         dedup.ngram_jaccard_pairs(docs, w=3, threshold=0.3, cache=False))
    dump("minhash_lsh_pairs_lazy",
         dedup.minhash_lsh_pairs(docs, w=3, k=64, bands=32, threshold=0.3,
                                 cache=False))
    pairs = dedup.ngram_jaccard_pairs(docs, w=3, threshold=0.3)
    e = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        edges.groupBy("a").agg(F.min("b").alias("nmin"))
        .select(F.col("a").alias("id"),
                F.least(F.col("a"), F.col("nmin")).alias("lbl"))
    )
    try:
        rnd = dedup._propagation_round(edges, labels, with_old=True)
    except TypeError:  # round-start tree: no with_old parameter
        rnd = dedup._propagation_round(edges, labels)
    dump("cc_propagation_round", rnd)


if __name__ == "__main__":
    main()
