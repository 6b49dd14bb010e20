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

  /** One parsed Avro record (or quarantined raw) — Option fields so
    * the product encoder yields the nullable withCorrupt shape. */
  private case class AvroDoc(doc_id: Option[Long], text: String,
                             lang: String, source: String,
                             n_chars: Option[Int], _corrupt: String)

  /** Avro container-file reader, same contract as the other readers:
    * the EXPECTED schema is explicit (each record is validated
    * field-by-field against the canonical documents schema — never
    * inferred from a scan), and corruption quarantines instead of
    * failing the job, at BOTH granularities: a record missing a
    * field / carrying a wrong-typed value quarantines that record
    * (with the file and record payload), and a file that isn't a
    * readable Avro container quarantines as one row for the file.
    *
    * Spark-first shape: files parallelize through the built-in
    * binaryFile source (no spark-avro module on this classpath; the
    * decode uses only avro-core, which is), one DataFileStream per
    * file inside mapPartitions — the standard many-shards crawl
    * layout, where the unit of parallelism is the file. Avro blocks
    * are also splittable WITHIN a file; a deployment with multi-GB
    * single files would extend the seam with block-level splits, the
    * same per-partition decode otherwise. Writer-side int widening
    * (int→long for doc_id, long→int for n_chars when exact) is
    * accepted, matching Avro's own promotion rules. */
  def readAvro(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
    val parsed = files.mapPartitions { it =>
      it.flatMap { case (p, bytes) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[AvroDoc]
        try {
          val reader =
            new org.apache.avro.file.DataFileStream[org.apache.avro.generic.GenericRecord](
              new java.io.ByteArrayInputStream(bytes),
              new org.apache.avro.generic.GenericDatumReader[
                org.apache.avro.generic.GenericRecord]())
          try {
            while (reader.hasNext) {
              val r = reader.next()
              out += (try {
                def fld(n: String): AnyRef = {
                  require(r.getSchema.getField(n) != null, s"missing field $n")
                  r.get(n)
                }
                val id = fld("doc_id") match {
                  case l: java.lang.Long => l.longValue
                  case i: java.lang.Integer => i.longValue
                  case other => throw new IllegalArgumentException(
                    s"doc_id not integral: $other")
                }
                // strings must BE strings (Avro decodes them as Utf8):
                // a blanket toString would launder ints/records/bytes
                // into the clean output as garbage text — the exact
                // schema drift the quarantine contract exists to catch
                def str(n: String): String = fld(n) match {
                  case null => null
                  case s: org.apache.avro.util.Utf8 => s.toString
                  case s: String => s
                  case other => throw new IllegalArgumentException(
                    s"$n not a string: ${other.getClass.getSimpleName}")
                }
                val nc = fld("n_chars") match {
                  case null => None
                  case i: java.lang.Integer => Some(i.intValue)
                  case l: java.lang.Long if l.longValue == l.intValue.toLong =>
                    Some(l.intValue)
                  case other => throw new IllegalArgumentException(
                    s"n_chars not an int: $other")
                }
                AvroDoc(Some(id), str("text"), str("lang"), str("source"),
                  nc, null)
              } catch {
                case e: Exception =>
                  AvroDoc(None, null, null, null, None, s"$p: $r (${e.getMessage})")
              })
            }
          } finally reader.close()
        } catch {
          case e: Exception =>
            // not an Avro container, truncated header, or a stream
            // that corrupts MID-FILE: quarantine the file WHOLE —
            // records decoded before the failure are discarded, not
            // emitted as clean (an operator repairing and re-ingesting
            // the quarantined file must not duplicate them)
            out.clear()
            out += AvroDoc(None, null, null, null, None,
              s"$p: unreadable container (${e.getMessage})")
        }
        out
      }
    }
    materialize(parsed.toDF())
  }
}
