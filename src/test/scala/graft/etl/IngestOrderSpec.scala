package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Multi-file ingest-order golden test for [[Ingest.ordinal]].
  *
  * Spark packs file splits into partitions sorted by file SIZE
  * (descending), so with a bare `monotonically_increasing_id()` ordinal
  * the keep-first winner follows file size, not file name: here `b.csv`
  * is made much larger than `a.csv`, so Spark reads it FIRST even though
  * `a.csv` sorts first lexicographically. The (file_path, block_start,
  * seq) struct ordinal must keep `a.csv`'s row regardless of the
  * physical read order.
  */
class IngestOrderSpec extends SparkSpec {

  test("keep-first dedup follows file-name order, not partition order") {
    val dir = Files.createTempDirectory("ingest-order").toFile
    dir.deleteOnExit()
    val header = "patient_id,first_name,last_name,sex,dob,height,weight\n"
    // a.csv: lexicographically first, physically tiny
    Files.writeString(new java.io.File(dir, "a.csv").toPath,
      header + "p-dup,Alice,FromA,F,1990-01-01,170 cm,65kg\n")
    // b.csv: lexicographically second, physically large (padding rows make
    // Spark's size-descending packing read it first)
    val pad = (1 to 2000).map(i =>
      s"p-pad$i,Pad,Row,M,1990-01-01,180 cm,80kg").mkString("\n")
    Files.writeString(new java.io.File(dir, "b.csv").toPath,
      header + "p-dup,Bob,FromB,M,1990-01-01,150 cm,50kg\n" + pad + "\n")

    val df = Patients.read(spark, dir.getAbsolutePath)

    // Premise check: the file Spark physically reads first is b.csv (it
    // got the lower monotonic seq) — without this the test can't
    // distinguish the ordinal from plain mid.
    val firstRead = df.filter(col("patient_id") === "p-dup")
      .orderBy(col("_ord.seq")).select("last_name").collect().map(_.getString(0))
    assert(firstRead.toSeq === Seq("FromB", "FromA"),
      "fixture no longer makes Spark read b.csv first; grow the padding")

    val (kept, dropped) =
      Dedup.keepFirst(df, Seq(col("patient_id")), col("_ord"))
    val winner = kept.filter(col("patient_id") === "p-dup")
      .select("last_name").collect().map(_.getString(0))
    assert(winner.toSeq === Seq("FromA"))
    assert(dropped.filter(col("patient_id") === "p-dup").count() === 1)
    assert(kept.count() === 2001) // p-dup + 2000 pads
  }
}
