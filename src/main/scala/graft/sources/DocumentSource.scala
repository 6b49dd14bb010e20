package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion sources/sinks for the documents pipeline: the formats a
  * training-data corpus actually arrives in (JSONL, CSV, raw text
  * dirs) normalized into the canonical documents schema, and the
  * sharded JSONL export a downstream trainer consumes.
  *
  * Scale stance: every reader is a declarative `spark.read` with an
  * EXPLICIT schema (never inference — a schema-inference pass is a
  * full extra scan at 100 TB) and PERMISSIVE corrupt-record capture,
  * so one malformed line quarantines instead of failing a 100 TB job.
  * The JSONL sink shards by repartition count — one file per shard,
  * no driver involvement.
  */
object DocumentSource {

  /** Canonical document schema (matches the testdata documents table). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("text", StringType, true),
    StructField("lang", StringType, true),
    StructField("source", StringType, true),
    StructField("n_chars", IntegerType, true)))

  private val withCorrupt = StructType(
    schema.fields :+ StructField("_corrupt", StringType, true))

  /** Materialize the raw read once so the corrupt-record column can be
    * filtered (Spark disallows referencing it on a live scan).
    * localCheckpoint, NOT cache: checkpoint blocks are freed by the
    * ContextCleaner when the frames become unreachable, whereas a
    * cache() here would pin the full input in storage for the session
    * lifetime on every ingest call with no handle to unpersist. */
  private def materialize(raw: DataFrame): (DataFrame, DataFrame) = {
    val snap = raw.localCheckpoint(true)
    val clean = snap.filter(col("_corrupt").isNull)
      .select(schema.fieldNames.map(col): _*)
    val corrupt = snap.filter(col("_corrupt").isNotNull).select(col("_corrupt"))
    (clean, corrupt)
  }

  /** JSON-lines reader: explicit schema + corrupt-line quarantine.
    * Returns (clean rows in canonical schema, corrupt raw lines). */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    materialize(spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path))

  /** CSV reader, same contract (header, explicit schema, quarantine). */
  def readCsv(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    materialize(spark.read.schema(withCorrupt)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path))

  /** Raw text directory: one document per file (common crawl-dump
    * shape). doc_id = stable hash of the file path; files stream
    * through `spark.read.text` with `wholetext`, never the driver. */
  def readTextDir(spark: SparkSession, path: String, source: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(col("value").as("text"))
      .withColumn("doc_id", xxhash64(input_file_name()))
      .withColumn("lang", lit(null).cast(StringType))
      .withColumn("source", lit(source))
      .withColumn("n_chars", length(col("text")).cast(IntegerType))
      .select(schema.fieldNames.map(col): _*)

  /** Sharded JSONL export — the trainer-facing sink. `shards` files,
    * written distributed. */
  def writeJsonl(docs: DataFrame, path: String, shards: Int): Unit =
    docs.repartition(shards).write.mode("overwrite").json(path)
}
