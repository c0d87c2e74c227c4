"""Decade-4 poll-path spot check: attach + extend + probe the 20 M
IVF-PQ index (built by ``tools/measure_decade4.py``) with a
poll-cycle-sized batch of 2 000 fresh + 1 000 replayed vectors.

Proves, at the fourth decade: ``attach_ivfpq_index`` re-registers the
persisted index in a fresh session (partitions recovered, bucket spec
re-declared), the extend's id-dedup stays map-side
(``batch_anti_join``), replays add nothing (exactly-once growth), and
the probe returns full k for every fresh query. BASELINE.md records
the walls. The fresh-id shift below must change between runs against
the same index (already-added ids would dedup to zero).
"""
import time
from pyspark.sql import functions as F
from trignis_spark.operators import ivfpq_index as ipq
from trignis_spark.session import get_spark

spark = get_spark("d4-extend", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
name = "sf10000_ivfpq"
ipq.attach_ivfpq_index(spark, name)
emb = spark.read.parquet(".localdata/sf10000e/embeddings.parquet").select("vec_id", "embedding")

# fresh batch: ids disjoint from the corpus (shift by 1<<41), embeddings nudged
fresh = emb.filter("vec_id % 9973 = 0").limit(2000).select(
    (F.col("vec_id") + F.lit(1 << 43)).alias("vec_id"),
    F.expr("transform(embedding, x -> x + 2e-3)").alias("embedding"))
replay = emb.filter("vec_id % 7919 = 0").limit(1000)
batch = fresh.unionByName(replay).localCheckpoint(eager=True)
nb = batch.count()
print(f"RESULT batch rows={nb}", flush=True)

t0 = time.time()
added = ipq.extend_ivfpq_index(spark, batch, name)
print(f"RESULT extend added={added} time={time.time()-t0:.1f}s", flush=True)
t0 = time.time()
added2 = ipq.extend_ivfpq_index(spark, batch, name)
print(f"RESULT replay added={added2} time={time.time()-t0:.1f}s", flush=True)

q = fresh.limit(200).localCheckpoint(eager=True)
t0 = time.time()
r = ipq.ivfpq_probe(spark, name, q, k=10, nprobe=2, shortlist=30)
hits = r.filter("neighbor_id = query_id").count()
cnt = r.count()
print(f"RESULT probe rows={cnt} self_hits={hits} time={time.time()-t0:.1f}s", flush=True)
spark.stop()
