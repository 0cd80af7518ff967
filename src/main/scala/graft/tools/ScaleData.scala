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
  * Fact AND entity-dimension tables replicate K times with key offsets
  * (order/customer/supplier/part key spaces stay disjoint per copy, and
  * fact FKs offset TOGETHER with their dims so every join stays valid)
  * — the TPC-H scaling convention, where only the fixed-cardinality
  * region/nation dims stay constant. Replicating facts against an
  * UNSCALED customer/supplier key space was the round-5 measurement
  * bug: the co-purchase graph kept the same nodes while edges tripled,
  * so triangle counting measured DENSIFICATION (inherently superlinear)
  * instead of growth — t(3×)/t(1×) read 11.6 when the honest same-
  * density exponent is ~1.
  *
  * Two tables get per-copy PERTURBATION, not plain replication, because
  * identical copies would change the workload's combinatorics, not just
  * its size: near-identical documents multiply LSH bucket collisions
  * quadratically (the first cut appended a tag token, which breaks
  * EXACT identity but leaves Jaccard ≈ 0.98 — every doc gained K-1
  * planted near-dups and the LSH measurement went quadratic the same
  * way). Copies now Caesar-shift the text's letters by the copy index:
  * token lengths, whitespace structure, and n_chars stay identical
  * (same tokenizer work, same quality scores) while every shingle set
  * becomes disjoint across copies. Embeddings rotate by the copy index
  * (preserves norms and pairwise-similarity distribution, decorrelates
  * copies).
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

    // fixed-cardinality dims: unchanged (TPC-H keeps 5 regions/25 nations
    // at every SF)
    Seq("region", "nation").foreach { t =>
      val p = s"$src/$t.parquet"
      if (new java.io.File(p).exists)
        spark.read.parquet(p).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    // entity dims scale WITH the facts so join fan-in density (orders per
    // customer, lineitems per supplier/part) stays constant
    Seq("customer" -> "c_custkey", "supplier" -> "s_suppkey",
        "part" -> "p_partkey").foreach { case (t, key) =>
      copies(spark.read.parquet(s"$src/$t.parquet"))
        .withColumn(key, col(key) + off)
        .drop("_copy")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    val orders = spark.read.parquet(s"$src/orders.parquet")
    copies(orders)
      .withColumn("o_orderkey", col("o_orderkey") + off)
      .withColumn("o_custkey", col("o_custkey") + off)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    copies(lineitem)
      .withColumn("l_orderkey", col("l_orderkey") + off)
      .withColumn("l_partkey", col("l_partkey") + off)
      .withColumn("l_suppkey", col("l_suppkey") + off)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // events: go through Tables.events, which normalizes every physical
    // ts encoding the harness has shipped (TIMESTAMP(NANOS)-as-long, NTZ
    // micros, adjusted micros) to one session-UTC TIMESTAMP — the
    // derivative then always writes a faithful micro-precision TIMESTAMP
    // that both engines and the read shim handle identically. user_id
    // offsets too: K× users, same activity per user — the per-key state
    // distribution the stream/window operators see stays constant while
    // volume scales.
    val events = graft.Tables.events(spark, src)
    copies(events)
      .withColumn("event_id", col("event_id") + off)
      .withColumn("user_id", col("user_id") + off)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    // Per-copy text perturbation: Caesar-shift letters by (c mod 26),
    // then rotate every maximal letter run's characters by (c div 26).
    // Residual cross-copy floor, MEASURED (r13, BASELINE.md): words
    // invariant under the rotation delta (1-letter words always;
    // L-letter words when delta ≡ 0 mod L, e.g. every 3-letter word
    // between copies 78 apart at K=100) still collide across shift
    // classes — at K=100 that cross-copy share is 0.017% of the
    // prefix-join candidate mass and 0.018% of the containment mass,
    // three orders below relevance; no further de-aliasing is needed.
    // Identical lengths and whitespace (same tokenizer/quality work per
    // doc), shingle sets disjoint across copies. The rotation layer is
    // the r12 de-aliasing fix: a letter-only substitution has exactly 26
    // classes, so at K=100 copies 0/26/52/78 carried IDENTICAL text —
    // every doc gained 3 planted exact dups and each shift class's
    // near-dup candidates went quadratic in K/26 (found as a 100×-not-
    // 10× candidate-shuffle blowup in the sf10 derivative; it also
    // inflated the r11 sf3.0 text-dedup exponents, where copies 26-29
    // aliased 0-3). Rotation by r ∈ [1, 26) de-aliases words of length
    // ≥ 2 that are not r-periodic, so cross-class shingle overlap drops
    // to the 1-letter-word floor — K up to 26·26 copies stay distinct.
    val caesar = udf { (text: String, c: Long) =>
      if (text == null || c == 0L) text
      else {
        val s = (c % 26).toInt
        val r = (c / 26).toInt
        val shifted = text.map {
          case ch if ch >= 'a' && ch <= 'z' => (((ch - 'a' + s) % 26) + 'a').toChar
          case ch if ch >= 'A' && ch <= 'Z' => (((ch - 'A' + s) % 26) + 'A').toChar
          case ch => ch
        }
        if (r == 0) shifted
        else {
          val sb = new java.lang.StringBuilder(shifted.length)
          var i = 0
          while (i < shifted.length) {
            var j = i
            while (j < shifted.length && shifted.charAt(j).isLetter) j += 1
            if (j > i) {
              val k = r % (j - i)
              sb.append(shifted, i + k, j).append(shifted, i, i + k)
              i = j
            } else { sb.append(shifted.charAt(i)); i += 1 }
          }
          sb.toString
        }
      }
    }
    val documents = spark.read.parquet(s"$src/documents.parquet")
    copies(documents)
      .withColumn("doc_id", col("doc_id") + off)
      .withColumn("text", caesar(col("text"), col("_copy")))
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    // rotation aliases every `dim` copies (the Caesar problem in vector
    // space) — past that, alternate-dim sign flips (norm-preserving,
    // decorrelating) key the second factor: dim·2 distinct copies
    val rot = udf { (v: Array[Float], c: Long) =>
      if (v == null || v.isEmpty || c == 0L) v
      else {
        val n = v.length; val s = (c % n).toInt
        val f = ((c / n) % 2L) == 1L
        Array.tabulate(n) { i =>
          val x = v((i + s) % n)
          if (f && i % 2 == 0) -x else x
        }
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
