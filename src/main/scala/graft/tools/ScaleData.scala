package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive a K×-scaled copy of an sf directory for
  * data-proportionality measurement (`runMain graft.tools.ScaleData
  * [srcDir] [dstDir] [K]`). At sf0.1 the bench is constant-overhead
  * dominated (~0.8 s/query median), which can hide an accidentally
  * superlinear operator — timing the heavy queries at sf0.1 vs K× and
  * fitting t ∝ n^e exposes it.
  *
  * Fact tables replicate K times with key offsets (orderkey spaces stay
  * disjoint per copy; o_orderkey/l_orderkey offset TOGETHER so joins
  * stay consistent); dimension tables pass through unchanged, so every
  * replicated fact still references a valid dim row — the TPC-H scaling
  * convention at the granularity this measurement needs.
  *
  * Two tables get per-copy PERTURBATION, not plain replication, because
  * identical copies would change the workload's combinatorics, not just
  * its size: duplicate documents multiply LSH bucket collisions
  * quadratically (a near-dup measurement over K identical corpora is
  * measuring a different, artificially-quadratic problem), and identical
  * embeddings pile into the same sign-LSH buckets. Documents get a
  * copy-tagged token appended (breaks exact/near-dup identity, keeps
  * length distribution); embeddings rotate by the copy index (preserves
  * norms and pairwise-similarity distribution, decorrelates copies).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/target/scaledata/sf0.3"
    val k = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame): DataFrame =
      (0 until k).map(i => df.withColumn("_copy", lit(i.toLong)))
        .reduce(_ unionByName _)

    // disjoint key spaces per copy: offset = _copy * 10^12 (far above any
    // generated key)
    val off = col("_copy") * 1000000000000L

    // dims: unchanged
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      val p = s"$src/$t.parquet"
      if (new java.io.File(p).exists)
        spark.read.parquet(p).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    val orders = spark.read.parquet(s"$src/orders.parquet")
    copies(orders)
      .withColumn("o_orderkey", col("o_orderkey") + off)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    copies(lineitem)
      .withColumn("l_orderkey", col("l_orderkey") + off)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // events: nanos timestamp handled by Tables.events at READ time; here
    // a plain passthrough replicate with offset ids keeps the file's
    // physical type intact. user_id offsets too: K× users, same activity
    // per user — the per-key state distribution the stream/window
    // operators see stays constant while volume scales.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$src/events.parquet")
    copies(events)
      .withColumn("event_id", col("event_id") + off)
      .withColumn("user_id", col("user_id") + off)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val documents = spark.read.parquet(s"$src/documents.parquet")
    copies(documents)
      .withColumn("doc_id", col("doc_id") + off)
      .withColumn("text",
        when(col("_copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" cvariant"),
            col("_copy").cast("string"), lit("x"),
            (col("doc_id") % 1000).cast("string"))))
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val rot = udf { (v: Array[Float], c: Long) =>
      if (v == null || v.isEmpty || c == 0L) v
      else {
        val n = v.length; val s = (c % n).toInt
        Array.tabulate(n)(i => v((i + s) % n))
      }
    }
    copies(emb)
      .withColumn("embedding", rot(col("embedding"), col("_copy")))
      .withColumn("vec_id", col("vec_id") + off)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"[scale] wrote ${k}x of $src to $dst")
    spark.stop()
  }
}
