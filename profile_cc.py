"""Round-6 profiling: where do dedup_component_sizes / dedup_survivors
spend their time at sf0.1? Phases: simhash pair generation, CC rounds,
final join. Not part of the package — a measurement scratch script."""
import sys
import time

sys.path.insert(0, "/root/repo")

from gistdex_spark.session import get_spark
from gistdex_spark.sources.tables import load_table, spread
from gistdex_spark.operators import dedup as D

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("profile-cc", cpus="32")
    docs = load_table(spark, SF, "documents")
    docs.count()  # warm scan

    t0 = time.perf_counter()
    pairs = D.simhash_pairs(
        spread(docs), bucket_partitions=spark.sparkContext.defaultParallelism
    )
    mat = pairs.localCheckpoint(eager=True)
    t1 = time.perf_counter()
    n_pairs = mat.count()
    print(f"pairs: {t1 - t0:.2f}s  n={n_pairs}", flush=True)

    t2 = time.perf_counter()
    comp = D.connected_components(mat)
    noop(comp)
    t3 = time.perf_counter()
    print(f"cc(on materialized pairs): {t3 - t2:.2f}s", flush=True)

    # full query as the bench sees it (pairs + cc + survivors join)
    for run in range(3):
        t4 = time.perf_counter()
        p2 = D.simhash_pairs(
            spread(docs),
            bucket_partitions=spark.sparkContext.defaultParallelism,
        )
        c2 = D.connected_components(p2)
        surv = D.dedup_survivors(docs.select("doc_id", "lang"), c2)
        noop(surv)
        t5 = time.perf_counter()
        print(f"full dedup_survivors run{run}: {t5 - t4:.2f}s", flush=True)


if __name__ == "__main__":
    main()
