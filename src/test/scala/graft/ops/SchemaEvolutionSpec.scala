package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution over a long-lived parquet table: a 100 TB table's
  * files are written across schema versions, and the engine must (a)
  * widen reads over mixed files with added columns null-filled, (b)
  * keep filter pushdown working on the merged schema, and (c) REFUSE
  * incompatibly-typed versions loudly rather than corrupt.
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_evo").toString

  test("mergeSchema widens over file versions; missing columns read null") {
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/version=1")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.parquet(s"$dir/version=2")
    val merged = spark.read.option("mergeSchema", true).parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "score", "v", "version"))
    val rows = merged.select("id", "score")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty) // v1 files null-fill
    assert(rows(3L).contains(30L) && rows(4L).contains(40L))
    // old-schema rows survive predicates on the NEW column (null-safe)
    assert(merged.filter(col("score") > 35).count() === 1)
  }

  test("pushdown survives the merged schema: filters reach the scan") {
    val dir = tmpDir()
    Seq((1L, "x")).toDF("id", "v").write.parquet(s"$dir/p=1")
    Seq((2L, "y", 9L)).toDF("id", "v", "score").write.parquet(s"$dir/p=2")
    val df = spark.read.option("mergeSchema", true).parquet(dir)
      .filter(col("id") === 2L).select("id", "v")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // assert the ACTUAL pushed predicate — "PushedFilters: []" also
    // contains the substring "PushedFilters", which made the old check
    // vacuously true even with pushdown disabled
    assert(scan.contains("EqualTo(id,2)") ||
      scan.contains("IsNotNull(id), EqualTo(id,2)"), scan)
    assert(df.collect().map(_.getString(1)).toSeq === Seq("y"))
  }

  test("incompatible column types across versions fail loudly, never coerce") {
    val dir = tmpDir()
    Seq((1L, 10)).toDF("id", "x").write.parquet(s"$dir/v=1") // x: int
    Seq((2L, "s")).toDF("id", "x").write.parquet(s"$dir/v=2") // x: string
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", true).parquet(dir).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("merge") ||
      msg.toLowerCase.contains("incompatible"), msg)
  }
}
