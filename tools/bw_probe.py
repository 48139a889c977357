"""Memory-bandwidth probe: pure codegen array traversal, no engine code."""
import sys, time
sys.path.insert(0, "/root/repo")
from fhir_data_validation_spark.session import get_spark
from pyspark.sql import functions as F

cores = int(sys.argv[1])
spark = get_spark(f"bw-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet("/tmp/fdv_scale_corpus_12800000")

probes = {
    # touches every token value (codegen, no shuffle)
    "array_max+min sum": lambda: df.agg(
        F.sum(F.array_max("tokens") + F.array_min("tokens"))).collect(),
    # hash of every byte of every array (heavier ALU per byte)
    "xxhash64 xor": lambda: df.agg(
        F.expr("bit_xor(xxhash64(tokens))")).collect(),
    # scalar column only (little data)
    "sum n_tok": lambda: df.agg(F.sum("n_tok")).collect(),
}
for name, fn in probes.items():
    fn()  # warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter(); fn(); walls.append(time.perf_counter() - t0)
    print(f"{cores:2d} cores  {name:18s} best {min(walls):6.2f}s  {walls}")
