"""Finer CC breakdown: warm pair-gen cost, per-round CC cost, round count."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gistdex_spark.session import get_spark
from gistdex_spark.sources.tables import load_table, spread
from gistdex_spark.operators import dedup as D

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("profile-cc2", cpus="32")
    docs = load_table(spark, SF, "documents")
    docs.count()

    def gen():
        return D.simhash_pairs(
            spread(docs),
            bucket_partitions=spark.sparkContext.defaultParallelism,
        )

    noop(gen())  # warm
    for i in range(2):
        t0 = time.perf_counter()
        noop(gen())
        print(f"warm pairs run{i}: {time.perf_counter() - t0:.2f}s", flush=True)

    pairs = gen().localCheckpoint(eager=True)

    # instrumented CC (mirrors operators/dedup.connected_components)
    t0 = time.perf_counter()
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")),
                F.struct(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst").distinct().localCheckpoint(eager=True)
    print(f"sym cut: {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    n_edges = sym.count()
    default_par = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    target = max(1, min(default_par, n_edges // 50_000 + 1))
    if target < default_par:
        sym = sym.repartition(target).localCheckpoint(eager=True)
    print(f"count+repartition (target={target}, edges={n_edges}): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node")).localCheckpoint(eager=True)
    )
    n_nodes = labels.count()
    print(f"labels init (n={n_nodes}): {time.perf_counter() - t0:.2f}s", flush=True)

    def step(lbl):
        nbr = (
            sym.join(lbl, sym.src == lbl.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node").agg(F.min("label").alias("nbr_min"))
        )
        stepped = lbl.join(nbr, "node", "left").select(
            "node",
            F.col("label").alias("__old"),
            F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias("__mid"),
        )
        parent = lbl.select(F.col("node").alias("__pn"), F.col("label").alias("__pl"))
        return stepped.join(parent, stepped.__mid == F.col("__pn"), "left").select(
            "node",
            F.least(F.col("__mid"), F.coalesce("__pl", F.col("__mid"))).alias("label"),
            (F.least(F.col("__mid"), F.coalesce("__pl", F.col("__mid"))) < F.col("__old"))
            .cast("int").alias("__chg"),
        )

    rounds = 0
    while rounds < 25:
        t0 = time.perf_counter()
        first = step(labels).drop("__chg").persist()
        fused = step(first)
        rounds += 2
        new_labels = fused.localCheckpoint(eager=True)
        first.unpersist()
        t_cut = time.perf_counter() - t0
        t0 = time.perf_counter()
        changed = new_labels.agg(F.sum("__chg")).first()[0] or 0
        t_agg = time.perf_counter() - t0
        labels = new_labels.drop("__chg")
        print(f"fused round {rounds}: cut={t_cut:.2f}s agg={t_agg:.2f}s "
              f"changed={changed}", flush=True)
        if changed == 0:
            break


if __name__ == "__main__":
    main()
