"""Streaming vector ingestion: an embeddings drop directory drained
into the incrementally-maintained ANN index (plans/ann_index.py) with
the corpus loop's exactly-once discipline (streaming/ingestion.py's
checkpoint-incarnation batch identity, reused verbatim).

Each micro-batch commits through :func:`plans.ann_index.
ann_ingest_delta` — manifest-last, so a crash replay re-runs the
batch and a post-commit replay no-ops by identity; a LOST checkpoint
mints a fresh nonce and the id-dedup gate (not id collision) absorbs
the re-read vectors while genuinely new ones are admitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EMBEDDINGS_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def stream_embeddings(spark: SparkSession, path: str,
                      schema: T.StructType = EMBEDDINGS_SCHEMA,
                      max_files_per_trigger: int | None = None
                      ) -> DataFrame:
    """Streaming Parquet source over a vector drop directory. Explicit
    schema (a streaming source cannot infer), same listing caveats as
    the document stream (streaming/ingestion.py module notes)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(path)


def run_vector_ingestion(spark: SparkSession, src_path: str,
                         index_root: str,
                         num_planes: int | None = None,
                         dim: int | None = None,
                         max_files_per_trigger: int | None = None):
    """Drain the drop directory into the incremental ANN index
    (availableNow: everything currently present, then stop; re-invoke
    to pick up only NEW files via the checkpoint). ``batch_id =
    stream-{nonce}-{epoch}`` with the nonce scoped to the checkpoint
    incarnation — see streaming/ingestion.run_ingestion_with_dedup
    for why an epoch-only id silently drops data after checkpoint
    loss. ``num_planes``/``dim`` default to the module constants on
    the FIRST ingest and to the stored ``_meta.json`` afterwards."""
    from ..fs import path_exists, read_text
    from ..operators.similarity import EMB_DIM, NUM_PLANES
    from ..plans.ann_index import (_meta_path, ann_ingest_delta)
    from ..plans.corpus import BatchAlreadyIngested

    stream = stream_embeddings(
        spark, src_path, max_files_per_trigger=max_files_per_trigger)
    checkpoint = f"{index_root}/_stream_checkpoint"
    nonce_cache: dict[str, str] = {}

    def nonce() -> str:
        if "v" not in nonce_cache:
            import json

            meta = json.loads(read_text(spark,
                                        f"{checkpoint}/metadata"))
            nonce_cache["v"] = meta["id"].replace("-", "")[:8]
        return nonce_cache["v"]

    def params() -> tuple[int, int]:
        if num_planes is not None and dim is not None:
            return num_planes, dim
        if path_exists(spark, _meta_path(index_root)):
            import json

            m = json.loads(read_text(spark, _meta_path(index_root)))
            return (num_planes or m["num_planes"], dim or m["dim"])
        return (num_planes or NUM_PLANES, dim or EMB_DIM)

    def drain(batch: DataFrame, epoch_id: int) -> None:
        np_, d = params()
        try:
            ann_ingest_delta(
                spark, index_root, batch,
                batch_id=f"stream-{nonce()}-{int(epoch_id):08d}",
                num_planes=np_, dim=d)
        except BatchAlreadyIngested:
            # same incarnation ⇒ same epoch = same file set (offsets
            # WAL precedes execution): genuine post-commit replay
            pass

    return (stream.writeStream
            .foreachBatch(drain)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
