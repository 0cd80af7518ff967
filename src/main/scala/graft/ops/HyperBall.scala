package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-function estimation via mergeable distinct sketches —
  * the HyperBall algorithm (Boldi & Vigna, 2013; HyperANF lineage) with
  * the engine's KMV sketch ([[graft.functions.KmvAgg]]) in the role
  * HyperLogLog plays in the paper. This is the 100 TB path for
  * `graph_two_hop_reach`: the exact query's mid-node self-join is
  * Σ d(mid)² pair work, which a social-scale graph cannot afford, while
  * the sketch formulation is one edge-keyed join per hop — each node's
  * ball-of-radius-r sketch is the MERGE of its neighbors' radius-(r−1)
  * sketches, and KMV merge ("k smallest of the union is a pure function
  * of the two k-smallest sets") makes that an associative aggregation
  * with O(k) state per node, never an expanded pair stream.
  *
  * Below k distinct members the KMV sketch IS the set, so on graphs
  * whose balls stay under k the estimate is EXACT — the property the
  * HyperBallSpec pins against a brute-force BFS. Above k the estimate
  * degrades gracefully to the (k−1)/v_k estimator's ~1/√k relative
  * error, which is the trade HyperBall exists to make.
  *
  * Merge is the bounded typed-Aggregator grouped merge
  * ([[graft.functions.KmvAgg.mergeSketches]]): a node's d neighbor
  * sketches fold with O(k) state and map-side partial aggregation —
  * the earlier explode + collect_set formulation held all d·k
  * candidate hashes per node before trimming, which on the dense
  * sf0.1 bench graph was the headline's whole cost.
  */
object HyperBall {

  /** Per-node 2-hop BALL size estimates (|{w : dist(v,w) ≤ 2}|,
    * self included — the paper's ball convention). Input may carry
    * duplicates or both orientations; k is the KMV sketch width.
    * Returns (node, sketch_size, ball2_est).
    */
  def twoHopBallSizes(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int = 256): DataFrame = {
    val canon = edges
      // cast BEFORE least/greatest — string ids order lexicographically
      // ("9" > "10") and the u < v filter would drop those edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val sym = canon.unionByName(
      canon.select(col("v").as("u"), col("u").as("v")))
    // node universe from the RAW edges: a node whose only incident edge
    // is a self-loop has no sym row (u < v drops it) but still owns the
    // ball {self} — dropping it would emit no row where a BFS oracle
    // reports size 1
    val nodes = edges.select(col(srcCol).cast("long").as("u"))
      .unionByName(edges.select(col(dstCol).cast("long").as("u")))
      .distinct()
    // radius-1 ball sketch: self + direct neighbors
    val members1 = sym.select(col("u"), col("v").cast("string").as("m"))
      .unionByName(
        nodes.select(col("u"), col("u").cast("string").as("m")))
    val h1 = members1.groupBy(col("u"))
      .agg(graft.functions.KmvAgg.sketchMd5(col("m"), k).as("sk"))
    // radius-2 = merge of every neighbor's radius-1 sketch with our own
    val neighborSk = sym
      .join(h1.select(col("u").as("v"), col("sk")), "v")
      .select(col("u"), col("sk"))
    val merged = neighborSk.unionByName(h1.select(col("u"), col("sk")))
      .groupBy(col("u"))
      .agg(graft.functions.KmvAgg.mergeSketches(col("sk"), k).as("sk2"))
    val estU = udf { (arr: Seq[Long]) =>
      math.floor(
        graft.functions.KmvAgg.estimateDistinctMd5(arr.toArray, k)).toLong
    }
    merged.select(col("u").as("node"), size(col("sk2")).as("sketch_size"),
      estU(col("sk2")).as("ball2_est"))
  }

  /** Ball-size estimates at radii 1, 2, 3 — the harmonic/closeness-
    * centrality input: each radius is ONE more sketch-merge round over
    * the edge list (the HyperBall iteration proper; [[twoHopBallSizes]]
    * is the unrolled radius-2 special case). Ball growth is monotone by
    * construction — ball_{r} ⊇ ball_{r−1}, and the KMV estimate of a
    * superset's k-smallest hash set is ≥ the subset's — so derived
    * per-shell differences are never negative. Per-round frames are
    * localCheckpoint'd: each round's sketch feeds both the next merge
    * and its own estimate, and the iterative-loop lineage rule applies.
    * Returns (node, b1, b2, b3).
    */
  def ballSizes3(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int = 256): DataFrame = {
    import graft.ops.Checkpoints.StageCheckpoint
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val sym = canon.unionByName(
        canon.select(col("v").as("u"), col("u").as("v")))
      .stageCheckpoint()
    val nodes = edges.select(col(srcCol).cast("long").as("u"))
      .unionByName(edges.select(col(dstCol).cast("long").as("u")))
      .distinct()
    val members1 = sym.select(col("u"), col("v").cast("string").as("m"))
      .unionByName(
        nodes.select(col("u"), col("u").cast("string").as("m")))
    val h1 = members1.groupBy(col("u"))
      .agg(graft.functions.KmvAgg.sketchMd5(col("m"), k).as("sk"))
      .stageCheckpoint()
    def nextRadius(h: DataFrame): DataFrame = sym
      .join(h.select(col("u").as("v"), col("sk")), "v")
      .select(col("u"), col("sk"))
      .unionByName(h)
      .groupBy(col("u"))
      .agg(graft.functions.KmvAgg.mergeSketches(col("sk"), k).as("sk"))
    val h2 = nextRadius(h1).stageCheckpoint()
    val h3 = nextRadius(h2)
    val estU = udf { (arr: Seq[Long]) =>
      math.floor(
        graft.functions.KmvAgg.estimateDistinctMd5(arr.toArray, k)).toLong
    }
    h1.select(col("u"), estU(col("sk")).as("b1"))
      .join(h2.select(col("u"), estU(col("sk")).as("b2")), "u")
      .join(h3.select(col("u"), estU(col("sk")).as("b3")), "u")
      .select(col("u").as("node"), col("b1"), col("b2"), col("b3"))
  }
}
