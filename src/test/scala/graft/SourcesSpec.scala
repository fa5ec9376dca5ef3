package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S1/S3/S4/S6: CSV ingest with the reference's options, parquet and
  * CSV round-trips. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv reads header, multiline quoted fields, escaped quotes (S1)") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "docs.csv")
    // a quoted field containing a newline and an escaped ("" with
    // escape='\"') quote, matching the reference's CSV dialect
    Files.writeString(f.toPath,
      "Name,Text\nann,\"line one\nline two\"\nbob,\"he said \"\"hi\"\"\"\n")
    val df = Tables.csv(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("Name", "Text"))
    val byName = df.as[(String, String)].collect().toMap
    assert(byName("ann") == "line one\nline two")
    assert(byName("bob") == "he said \"hi\"")
  }

  test("parquet write/read round-trips an embedding array column (S3/S4)") {
    val dir = Files.createTempDirectory("graft_pq").toFile.getAbsolutePath + "/emb"
    val df = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(0.3f, 0.4f))).toDF("id", "vec")
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).orderBy("id")
      .as[(Long, Seq[Float])].collect().toSeq
    assert(back == Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(0.3f, 0.4f))))
  }

  test("csv write emits a readable metrics table (S6)") {
    val dir = Files.createTempDirectory("graft_out").toFile.getAbsolutePath + "/metrics"
    val df = Seq(("q1", 0.9), ("q2", 0.7)).toDF("query", "recall")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").csv(dir)
      .select(col("query"), col("recall").cast("double"))
      .as[(String, Double)].collect().toMap
    assert(back == Map("q1" -> 0.9, "q2" -> 0.7))
  }

  test("q51 CSV ingest replays the reference preprocessing chain") {
    val out = RetrievalQueries.q51CsvIngest(spark, sf0001)
      .as[(Long, String, String)].collect().toSeq
    // 8 fixture rows: id 5 has a null transcription (dropped), id 4 is
    // a whitespace-variant duplicate of id 1 that collapses only after
    // cleaning (dropped, keep-first). id 8 differs in case → kept.
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 6L, 7L, 8L))
    val byId = out.map(r => r._1 -> r._3).toMap
    assert(byId(1L) ==
      "Cardiology, Patient presents with chest pain. Follow-up in two weeks.")
    assert(byId(2L).contains("\"mild\"")) // doubled-quote escape decoded
    assert(byId(3L) == "Routine physical, all normal.") // no prefix: null specialty
    assert(byId(6L).startsWith("Emergency\nMedicine, ")) // quoted newline in attribute col
    assert(byId(7L).startsWith("Internal Medicine, Geriatrics, ")) // embedded comma
  }

  test("all ten testdata tables load (catalog)") {
    Tables.all.foreach { t =>
      assert(Tables.load(spark, sf0001, t).columns.nonEmpty, t)
    }
  }
}
