package graft

import graft.sources.DocumentSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Ingestion sources/sinks: format round-trips, corrupt-line
  * quarantine, and the sharded trainer-facing JSONL export. */
class SourceSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("jsonl round-trip: export shards, re-read, quarantine corrupt lines") {
    val docs = Tables.documents(spark, sf).limit(100)
    val dir = tmp("graft_jsonl")
    DocumentSource.writeJsonl(docs, dir, shards = 3)
    // 3 shards written, distributed
    val parts = new java.io.File(dir).listFiles.count(_.getName.startsWith("part-"))
    assert(parts == 3)
    // plant a corrupt line among the shards
    Files.writeString(java.nio.file.Paths.get(dir, "part-corrupt.json"),
      """{"doc_id": 1, "text": "unterminated""" + "\n")
    val (clean, corrupt) = DocumentSource.readJsonl(spark, dir)
    assert(clean.count() == 100)
    assert(corrupt.count() == 1)
    // full-fidelity round trip (same rows, same values)
    val back = clean.orderBy("doc_id").collect().map(_.toSeq)
    val orig = docs.orderBy("doc_id").collect().map(_.toSeq)
    assert(back.sameElements(orig))
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val dir = tmp("graft_orc")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == docs.count())
    assert(back.schema == docs.schema)
    val filtered = back.filter(col("doc_id") < 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"orc scan did not push the doc_id filter:\n$plan")
    assert(filtered.count() == docs.filter(col("doc_id") < 10).count())
  }

  test("csv reader quarantines malformed rows under an explicit schema") {
    val dir = tmp("graft_csv")
    Files.writeString(java.nio.file.Paths.get(dir, "docs.csv"),
      """doc_id,text,lang,source,n_chars
        |1,hello world,en,src0,11
        |not_a_number,bad row,en,src0,7
        |2,zweite zeile,de,src1,12
        |""".stripMargin)
    val (clean, corrupt) = DocumentSource.readCsv(spark, dir)
    assert(clean.count() == 2 && corrupt.count() == 1)
    assert(clean.filter(col("doc_id") === 2L).select("lang").head().getString(0) == "de")
  }

  test("avro reader: round-trip plus record- and file-level quarantine") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmp("graft_avro")
    val docSchema = new Schema.Parser().parse(
      """{"type":"record","name":"doc","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"text","type":["null","string"],"default":null},
        |{"name":"lang","type":["null","string"],"default":null},
        |{"name":"source","type":["null","string"],"default":null},
        |{"name":"n_chars","type":["null","int"],"default":null}]}"""
        .stripMargin)
    val docs = Tables.documents(spark, sf).limit(50)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    def write(file: String, schema: Schema)(rows: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(dir, file))
      try rows.foreach(w.append) finally w.close()
    }
    write("good.avro", docSchema)(docs.map { case (id, t, l, s, nc) =>
      val r = new GenericData.Record(docSchema)
      r.put("doc_id", id); r.put("text", t); r.put("lang", l)
      r.put("source", s); r.put("n_chars", nc.toInt)
      r
    }.toSeq)
    // a file written with a FOREIGN schema (no doc_id): every record
    // quarantines individually, the file itself reads fine
    val alien = new Schema.Parser().parse(
      """{"type":"record","name":"other","fields":[
        |{"name":"id","type":"long"},{"name":"body","type":"string"}]}"""
        .stripMargin)
    write("alien.avro", alien)((1L to 3L).map { i =>
      val r = new GenericData.Record(alien)
      r.put("id", i); r.put("body", s"row $i")
      r
    })
    // not an Avro container at all: one whole-file quarantine row
    Files.writeString(java.nio.file.Paths.get(dir, "junk.avro"),
      "definitely not avro")
    val (clean, corrupt) = DocumentSource.readAvro(spark, dir.toString)
    assert(clean.count() == 50)
    val corrupts = corrupt.collect().map(_.getString(0))
    assert(corrupts.length == 4, corrupts.mkString("\n"))
    assert(corrupts.count(_.contains("missing field doc_id")) == 3)
    assert(corrupts.count(_.contains("unreadable container")) == 1)
    // full-fidelity round trip against the source rows
    val back = clean.orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Int]("n_chars").toLong))
    assert(back.sameElements(docs))
  }

  test("text-dir reader: one doc per file with stable hashed ids") {
    val dir = tmp("graft_txt")
    Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "alpha doc\nsecond line")
    Files.writeString(java.nio.file.Paths.get(dir, "b.txt"), "beta doc")
    val docs = DocumentSource.readTextDir(spark, dir, source = "dump1")
    val rows = docs.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 2)
    assert(rows.exists(_.getAs[String]("text").contains("second line")))
    assert(rows.forall(_.getAs[String]("source") == "dump1"))
    // ids are stable across reads (hash of path, not partition order)
    val again = DocumentSource.readTextDir(spark, dir, "dump1")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(rows.map(_.getAs[Long]("doc_id")).sorted))
  }
}
