"""End-to-end corpus deduplication demo: pair finders -> connected
components -> keeper selection -> filtered corpus.

Shows the full training-data dedup flow over the driver testdata
documents table:

1. exact duplicate groups (md5 hash-aggregate);
2. near-duplicate PAIRS three ways — capped n-gram Jaccard
   (inverted index), MinHash+LSH (candidate-bounded verify), and
   SimHash (banded hamming);
3. pairs -> GROUPS via connected components (near-duplication is not
   transitive: A~B and B~C must still collapse to one keeper);
4. the deduplicated corpus: drop every non-keeper.

Run: python examples/dedup_demo.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from drain3_spark.pipeline.dedup import (connected_components,
                                         exact_duplicates, jaccard_pairs,
                                         minhash_lsh_duplicates,
                                         simhash_duplicates)
from drain3_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dedup_demo", master="local[8]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    print(f"corpus: {n_docs} documents")

    exact = exact_duplicates(docs)
    n_exact_extra = exact.agg(F.sum(F.col("n_docs") - 1)).first()[0] or 0
    print(f"exact:   {exact.count()} duplicate groups "
          f"({n_exact_extra} redundant copies)")

    jac = jaccard_pairs(docs, k=3, threshold=0.5, block_col="source")
    lsh = minhash_lsh_duplicates(docs, k=3, threshold=0.5)
    sim = simhash_duplicates(docs)
    print(f"pairs:   jaccard(0.5)={jac.count()}  lsh-verified={lsh.count()}  "
          f"simhash(hamming<=3)={sim.count()}")

    # union all pair evidence, then resolve transitively
    pairs = (jac.select("id_a", "id_b")
             .unionByName(lsh.select("id_a", "id_b"))
             .unionByName(sim.select("id_a", "id_b"))
             .distinct())
    groups = connected_components(pairs)
    n_groups = groups.select("group_id").distinct().count()
    n_involved = groups.count()
    print(f"groups:  {n_involved} near-dup docs collapse into {n_groups} "
          f"groups (keeper = min doc_id)")

    drop = groups.filter(F.col("id") != F.col("group_id")) \
        .select(F.col("id").alias("doc_id"))
    deduped = docs.join(drop, "doc_id", "left_anti")
    print(f"deduped: {deduped.count()} documents kept "
          f"({n_docs - deduped.count()} dropped)")
    spark.stop()


if __name__ == "__main__":
    main()
