package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * min-label propagation with POINTER DOUBLING and HOOKING
  * (Shiloach–Vishkin 1982, expressed as DataFrame joins).
  *
  * Round 7 (VERDICT r6 item 2): the plain min-label loop needs
  * O(diameter) rounds, so a chain-shaped near-dup graph (mosaic
  * plagiarism stitching A→B→C→…) hit the round cap and failed loudly
  * by design. Each round now applies three decreasing updates:
  *   l(u) ← min(l(u), min_{v∈N(u)} l(v),   — one-hop propagation
  *               l(l(u)),                   — pointer jump
  *               hook(l(u)))                — root hooking
  * where hook(w) = min over region members {u : l(u)=w} of their min
  * neighbor-label. Jumping alone is NOT enough (measured): a winning
  * label still crawls from a region's boundary to its root one hop per
  * round before the jump can fan it out; hooking hands it to the root
  * in one round, and the jump broadcasts it to the region the next —
  * O(log diameter) rounds (spec-pinned: a 4096-link chain with
  * adversarially permuted ids converges in 16 rounds) instead of
  * O(diameter).
  *
  * Fixpoint correctness: all three updates assign node ids from the
  * SAME component (labels are mins over component-internal sets), and
  * at convergence l(u) ≤ l(v) across every edge (both directions ⇒
  * equality per component), so the constant is the component minimum —
  * the SAME labels the one-hop loop and the oracle's recursive
  * reachability produce. The round cap stays a loud failure, now
  * unreachable for any real input.
  *
  * Scale: per round, one edge-keyed join + min-combine (the shuffle
  * every CC variant pays) + one node-keyed label self-join (node-scale,
  * strictly smaller). `localCheckpoint` truncates iterative lineage —
  * AND each round's frame is rebuilt from the checkpointed RDD to shed
  * Catalyst STATS: `localCheckpoint` preserves the origin plan's
  * sizeInBytes, and with ≥2 joins per round the estimate compounds
  * multiplicatively round over round — by round ~12 the driver was
  * spending MINUTES in BigInteger.multiply inside
  * SizeInBytesOnlyStatsPlanVisitor.visitJoin (million-digit sizes;
  * found via thread dump when the 4096-chain spec hung). Fresh
  * LogicalRDD stats are the bounded default, and AQE re-plans from
  * runtime sizes anyway.
  */
object Components {

  /** Labels frame (node, lab) for the symmetric closure of `pairs`
    * (columns d1, d2). Nodes without edges are absent (callers
    * left-join and coalesce to self). `tag` names the loud failure.
    */
  def run(pairs: DataFrame, tag: String, maxRounds: Int = 60): DataFrame =
    runCounting(pairs, tag, maxRounds)._1

  /** [[run]] plus the realized round count (spec hook). */
  def runCounting(pairs: DataFrame, tag: String,
      maxRounds: Int = 60): (DataFrame, Int) = {
    val p = pairs.select(col(pairs.columns(0)).as("d1"),
      col(pairs.columns(1)).as("d2"))
    val edges = p.union(p.select(col("d2").as("d1"), col("d1").as("d2")))
    var labels = edges.select(col("d1").as("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxRounds) {
      val prop = edges.join(labels.withColumnRenamed("node", "d1"), "d1")
        .select(col("d2").as("node"), col("lab"))
        .groupBy("node").agg(min("lab").as("plab"))
      // pointer jump: l(l(u)) — every label IS a node id present in
      // `labels` (labels start at identity and only take mins of node
      // ids), so the lookup join is inner-complete.
      val jump = labels
        .join(labels.select(col("node").as("lab"), col("lab").as("jlab")),
          Seq("lab"))
        .select(col("node"), col("jlab"))
      // hook: the min neighbor-label seen by ANY member of a label
      // region updates the region's ROOT directly. Without it the
      // winning label crawls from the region boundary to the root one
      // hop per round before the jump can fan it out (measured on the
      // 4096-chain probe: long changed=5 plateaus between bursts, >60
      // rounds total; with hooking, 16). hlab values are labels of
      // region-adjacent nodes — same component, so the fixpoint is
      // unchanged.
      val hook = labels.join(prop, Seq("node"))
        .select(col("lab").as("node"), col("plab"))
        .groupBy("node").agg(min("plab").as("hlab"))
      val cp = labels.join(prop, Seq("node"), "left")
        .join(jump, Seq("node"), "left")
        .join(hook, Seq("node"), "left")
        .select(col("node"),
          least(col("lab"), coalesce(col("plab"), col("lab")),
            coalesce(col("jlab"), col("lab")),
            coalesce(col("hlab"), col("lab"))).as("lab"),
          (least(coalesce(col("plab"), col("lab")),
            coalesce(col("jlab"), col("lab")),
            coalesce(col("hlab"), col("lab"))) < col("lab")).as("changed"))
        .localCheckpoint()
      // rebuild from the checkpointed RDD: sheds the compounded join
      // stats (see scaladoc) while keeping the truncated lineage
      val next = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("node", "lab")
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"$tag: min-label+jump propagation not converged after $iter rounds")
    (labels, iter)
  }
}
