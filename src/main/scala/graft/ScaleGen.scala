package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of a driver-generated SF directory
  * (TESTDATA.md layout) for scale validation: the oracle gate and the
  * bench can then run at 10× the largest shipped SF and per-query
  * runtime ratios expose any super-linear plan.
  *
  * Scaling model — `copies` replicas of every SF-scaled table, each
  * replica's entity keys offset by a per-entity power-of-ten base so
  * key uniqueness AND referential integrity hold within every replica
  * (orders.o_custkey moves with customer.c_custkey, lineitem moves
  * with orders/part/supplier, events.user_id gets 10× distinct users
  * with the same per-user behavior). Fixed dimensions (region,
  * nation) are copied verbatim, like TPC-H at every SF.
  *
  * Content is perturbed so the data's STRUCTURE scales linearly
  * instead of degenerating into 10 exact copies:
  *  - documents.text: every token in replica r>0 gets suffix r
  *    ("word"→"word3") — replica vocabularies are disjoint, so dedup /
  *    similarity candidate structure is 10 independent corpora (10×
  *    work, 10× results), not a 45-pairs-per-doc duplicate explosion
  *    that would misattribute data blowup to the plans being measured.
  *  - embeddings.embedding: replica r rotates the vector by r
  *    positions — norms preserved, rotations of gaussian-ish vectors
  *    decorrelate, so no spurious near-dup pairs.
  *  - events.ts is rewritten as a true micros TIMESTAMP (the source
  *    file is TIMESTAMP(NANOS), readable only via the nanosAsLong
  *    legacy flag) so DuckDB oracles see a timestamp at sf1 exactly
  *    as they do on the driver's own files.
  *
  * Output layout matches the driver's: ONE parquet file per table at
  * `<dst>/<name>.parquet` (coalesce(1) + rename), so Tables.load,
  * the streaming staging and tools/check.py all work unchanged.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcDir> <dstDir> [copies]")
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, dst, copies)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")

    /** Smallest power of ten strictly above the column's max — the
      * per-replica key offset stride. */
    def baseOf(df: DataFrame, c: String): Long = {
      val m = df.agg(max(col(c))).head().getAs[Number](0).longValue()
      var b = 10L; while (b <= m) b *= 10; b
    }

    val customer = load("customer"); val cB = baseOf(customer, "c_custkey")
    val supplier = load("supplier"); val sB = baseOf(supplier, "s_suppkey")
    val part     = load("part");     val pB = baseOf(part, "p_partkey")
    val orders   = load("orders");   val oB = baseOf(orders, "o_orderkey")
    val events   = load("events")
    val docs     = load("documents")
    val embs     = load("embeddings")
    val eB = baseOf(events, "event_id")
    val uB = baseOf(events, "user_id")
    val dB = baseOf(docs, "doc_id")
    val vB = baseOf(embs, "vec_id")
    // the planted-dup overlays in the dedup queries add +1e6 to ids;
    // scaled ids must stay below that or planted copies collide
    require(dB * copies < Tables.PlantedIdBase,
      s"doc_id base $dB x $copies crosses the planted-id boundary")
    require(vB * copies < Tables.PlantedIdBase,
      s"vec_id base $vB x $copies crosses the planted-id boundary")

    /** Cross the table with replica indexes 0..copies-1 and apply the
      * per-replica column rewrites (cols keeps source order). */
    def replicate(df: DataFrame, rewrites: (String, Column => Column)*): DataFrame = {
      val reps = spark.range(copies.toLong).select(col("id").cast("int").as("__r"))
      val crossed = df.crossJoin(broadcast(reps))
      val rw = rewrites.toMap
      crossed.select(df.columns.map { c =>
        rw.get(c).map(f => f(col(c)).as(c)).getOrElse(col(c))
      }.toIndexedSeq: _*)
    }
    val r = col("__r")
    def off(base: Long): Column => Column = c => (c + r.cast("long") * base).cast("long")

    def writeOne(name: String, df: DataFrame): Unit = {
      val tmp = s"$dst/.stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = java.nio.file.Paths.get(tmp)
      // NIO directory streams hold an open fd until close()d
      val listStream = java.nio.file.Files.list(dir)
      var found: java.nio.file.Path = null
      try {
        val part = listStream.iterator()
        while (part.hasNext) {
          val p = part.next()
          if (p.getFileName.toString.startsWith("part-") &&
              p.getFileName.toString.endsWith(".parquet")) found = p
        }
      } finally listStream.close()
      require(found != null, s"no part file for $name")
      val target = java.nio.file.Paths.get(dst, s"$name.parquet")
      java.nio.file.Files.deleteIfExists(target)
      java.nio.file.Files.move(found, target)
      // reclaim the staging dir (success markers etc.)
      val walkStream = java.nio.file.Files.walk(dir)
      try walkStream.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walkStream.close()
      println(s"[scalegen] $name: ${spark.read.parquet(target.toString).count()} rows")
    }

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    // fixed dimensions: verbatim
    writeOne("region", load("region"))
    writeOne("nation", load("nation"))

    writeOne("customer", replicate(customer, "c_custkey" -> off(cB)))
    writeOne("supplier", replicate(supplier, "s_suppkey" -> off(sB)))
    writeOne("part", replicate(part, "p_partkey" -> off(pB)))
    writeOne("orders", replicate(orders,
      "o_orderkey" -> off(oB), "o_custkey" -> off(cB)))
    writeOne("lineitem", replicate(load("lineitem"),
      "l_orderkey" -> off(oB), "l_partkey" -> off(pB), "l_suppkey" -> off(sB)))

    val eventsTs = Tables.events(spark, src) // ts normalized to micros
    writeOne("events", replicate(eventsTs,
      "event_id" -> off(eB), "user_id" -> off(uB)))

    // replica r>0 suffixes every alphanumeric token with r: disjoint
    // vocabularies per replica. ($1 + digit is safe in Java regex
    // replacement: group 1r is out of range, so it parses as group 1
    // followed by the literal digit — but only for single-digit r,
    // hence the cap.)
    require(copies <= 10, "token-suffix scheme supports at most 10 replicas")
    // Disjointness precondition: a source token ending in a digit can
    // collide with a suffixed replica token ("foo1" in replica 0 vs
    // replica 1's rewrite of "foo") — cross-replica shared shingles
    // would then inflate df counts and plant cross-replica near-dup
    // candidates, quietly breaking the "10 independent corpora"
    // invariant the scaling ratios rely on. One scan at generation
    // time keeps the failure loud instead.
    val digitEnding = docs.select(explode(
        graft.plans.HashExpressions.tokens(col("text"))).as("t"))
      .filter(col("t").rlike("[0-9]$")).limit(1).count()
    require(digitEnding == 0,
      "source corpus has digit-ending tokens; the replica token-suffix " +
        "scheme would collide across replicas — pick a different suffix")
    writeOne("documents", replicate(docs,
      "text" -> (c => when(r === 0, c).otherwise(
        regexp_replace(c, lit("([A-Za-z0-9]+)"), concat(lit("$1"), r.cast("string"))))),
      "doc_id" -> off(dB),
      "n_chars" -> (c => c)) // recomputed below against the new text
      .withColumn("n_chars", length(col("text")).cast(docs.schema("n_chars").dataType)))

    // replica r rotates the embedding left by r positions
    writeOne("embeddings", replicate(embs,
      "vec_id" -> off(vB),
      "embedding" -> (c => when(r === 0, c).otherwise(
        concat(slice(c, r + 1, size(c) - r), slice(c, lit(1), r))))))

    println(s"[scalegen] done: $dst (${copies}x $src)")
  }
}
