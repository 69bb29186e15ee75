package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables, VectorLsh}

/** 1-bit embedding binarization + Hamming retrieval — the extreme end of
  * the quantization ladder (#86 int8 → #59 PQ → this): keep only the
  * SIGN of each dimension, packed into two 32-bit sign words per
  * vector, and retrieve by Hamming distance (XOR + popcount per word
  * per candidate).
  * For random-projection-style embeddings sign agreement estimates the
  * angle (the SimHash/binary-embedding identity: P[bit match] =
  * 1 − θ/π), which is why binary stores are the cheapest serving tier
  * real retrieval stacks ship — 8 bytes/vector, SIMD-popcount scans,
  * exact rerank on the shortlist (#120's pattern).
  */
object Binarize {

  /** Word width: 32 sign bits per BIGINT word (two words for the 64
    * dims). Sub-63 widths keep every mask positive — the same sign-bit
    * portability rule the Bloom filter's 62-bit words follow (DuckDB
    * range-checks `1 << 63`; Spark wraps — a full 64-bit word would
    * diverge).
    */
  val BitsPerWord = 32

  /** Packed sign signature of dims [lo+1, lo+BitsPerWord]: bit j set
    * iff v_{lo+j+1} > 0. A flat 32-term bitwise-OR projection — pure
    * codegen'd column arithmetic, no HOF lambda, no shuffle
    * (bit-packing is a map-only ingest step at any scale).
    */
  private[graft] def signature(v: Column, lo: Int): Column =
    (1 to BitsPerWord).map(j =>
      when(element_at(v, lo + j) > 0.0, lit(1L << (j - 1))).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)

  /** #159: per-query Hamming top-K over the packed signatures (rank by
    * (distance ASC, vec_id ASC) — total order). Queries broadcast; the
    * data side scans two sign words per vector; the candidate stream
    * collapses through [[graft.functions.TopK]]'s K-bounded heap
    * aggregate — a hash aggregate with a map-side partial phase, so
    * only K rows per (query, partition) cross the wire and NOTHING is
    * sorted (round 9: the previous two-phase salted-WINDOW form
    * shuffle-sorted all n²/QueryMod candidate rows, which started
    * spilling at sf3 — 13.4× at 3× data vs the 9× candidate bound; the
    * heap removes the sort while keeping the identical kept set, so
    * the oracle is unchanged). The signature column is computed inline
    * here; a production store computes it once at ingest and scans the
    * packed column.
    */
  /** Packed-signature frame (vec_id, sig_lo, sig_hi). The repartition
    * AFTER the signature projection is load-bearing: it is the
    * materialization barrier that makes the packed words real columns
    * before any pair loop. Without it, whole-stage codegen fuses the
    * projection into the join stage above and lazily evaluates the
    * 2×32-term sign fold at first use — INSIDE the per-broadcast-row
    * loop, i.e. once per PAIR instead of once per row (measured: 56 s
    * → 2.3 s at sf3; the sf3 13.4×-then-8× scaling anomalies were
    * this, not the aggregate). A production store persists the packed
    * column at ingest, which is the same barrier in table form
    * (#337's codes).
    */
  private[graft] def packed(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), signature(col("v"), 0).as("sig_lo"),
        signature(col("v"), BitsPerWord).as("sig_hi"))
      .repartition(32)

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % Ann.QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("sig_lo").as("q_lo"),
        col("sig_hi").as("q_hi"))

  /** Exhaustive scan stage shared by #159 and #342's fallback leg:
    * every (data, query) pair scanned, collapsed through the K-bounded
    * heap. crossJoin + filter, not join(cond): a non-equi inner BNLJ
    * falls off the codegen path; cross+filter keeps the scan fused
    * (2.6×).
    */
  private def exhaustiveTopK(e: DataFrame, q: DataFrame): DataFrame =
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        expr("bit_count(sig_lo ^ q_lo) + bit_count(sig_hi ^ q_hi)"))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMin(
        col("hamming").cast("double"), col("vec_id"), Ann.K).as("tk"))

  private def ranked(tk: DataFrame): DataFrame =
    tk.select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        col("s.score").cast("int").as("hamming"),
        (col("pos") + 1).cast("int").as("rank"))

  def hammingTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = packed(spark, dir)
    ranked(exhaustiveTopK(e, queriesOf(e)))
  }

  // ------------------------------------------------- #342 multi-index MIH

  /** Bands for the multi-index tier: 8 disjoint 8-bit substrings
    * covering all 64 sign bits. Pigeonhole: hamming(x, y) ≤ NBands−1 ⇒
    * fewer mismatched bits than bands ⇒ SOME band is an exact match —
    * so band-equal candidate generation is lossless up to radius 7.
    */
  val NBands = 8
  val BandBits = 8

  /** Band b (0–7) of a packed signature: an 8-bit substring of the two
    * 32-bit words. */
  private def bandVal(lo: Column, hi: Column, b: Int): Column =
    (if (b < 4) shiftright(lo, BandBits * b)
     else shiftright(hi, BandBits * (b - 4))).bitwiseAND(lit(255L))

  /** Banded candidate pairs (q_id, vec_id, hamming), EXACTLY ONE row
    * per (query, vector) pair that shares ≥ 1 exact band — the
    * multi-index hashing candidate stream (Norouzi et al., "Fast
    * Search in Hamming Space with Multi-Index Hashing", CVPR'12 —
    * public method; reference repo has no ANN code). Dedup is the MIH
    * first-match rule, not a DISTINCT shuffle: a pair is emitted only
    * from its SMALLEST matching band, enforced by a post-join filter
    * that checks all earlier bands differ (both signatures ride along,
    * so the check is two XOR words and a mask chain — codegen'd, no
    * extra shuffle). Cost is |candidates| ≈ |Q|·N·B/2^bits per band
    * population — the bounded-bucket discipline the dedup family uses,
    * replacing the exhaustive |Q|·N scan when the corpus is clustered.
    */
  private[graft] def bandCandidates(e: DataFrame, q: DataFrame): DataFrame = {
    def explodeBands(df: DataFrame, lo: String, hi: String): DataFrame =
      df.select(col("*"), explode(array((0 until NBands).map(b =>
        struct(lit(b).as("b"),
          bandVal(col(lo), col(hi), b).as("bv"))): _*)).as("band"))
        .select(col("*"), col("band.b").as("b"), col("band.bv").as("bv"))
        .drop("band")
    val eb = explodeBands(e, "sig_lo", "sig_hi")
    val qb = explodeBands(q, "q_lo", "q_hi")
      .withColumnRenamed("b", "qb").withColumnRenamed("bv", "qbv")
    val joined = eb.join(broadcast(qb),
      col("b") === col("qb") && col("bv") === col("qbv") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("xlo", expr("sig_lo ^ q_lo"))
      .withColumn("xhi", expr("sig_hi ^ q_hi"))
    // first-match rule: no band b' < b also matches (bandZero(b') ⇔ the
    // b'-th 8-bit substring of the XOR words is all-zero).
    def bandZero(b: Int): Column =
      bandVal(col("xlo"), col("xhi"), b) === 0L
    val firstMatch = (0 until NBands).map { b =>
      val earlierDiffer =
        if (b == 0) lit(true)
        else (0 until b).map(bp => !bandZero(bp)).reduce(_ && _)
      (col("b") === b, earlierDiffer)
    }.foldRight(lit(false)) { case ((is, cond), acc) => when(is, cond).otherwise(acc) }
    joined.filter(firstMatch)
      .select(col("q_id"), col("vec_id"),
        (expr("bit_count(xlo)") + expr("bit_count(xhi)")).as("hamming"))
  }

  /** Stage split for [[mihTopK]]: (certified per-query top-k arrays,
    * fallback query rows). A query is CERTIFIED when its banded
    * candidate top-k has a full K entries and its K-th distance is
    * ≤ NBands−1: pigeonhole then guarantees every vector ranking at or
    * before the K-th candidate is itself a candidate, so the candidate
    * top-k IS the exact top-k. Everything else (K-th distance too far,
    * or fewer than K candidates — including queries with zero
    * candidates, restored by the anti-join) falls back to the
    * exhaustive scan, restricted to just those queries.
    */
  private[graft] def mihSplit(e: DataFrame, q: DataFrame)
      : (DataFrame, DataFrame) = {
    val tk = bandCandidates(e, q)
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMin(
        col("hamming").cast("double"), col("vec_id"), Ann.K).as("tk"))
    val certified = tk.filter(size(col("tk")) === Ann.K &&
      element_at(col("tk"), Ann.K).getField("score") <= lit((NBands - 1).toDouble))
    val fallbackQ = q.join(certified.select(col("q_id")), Seq("q_id"), "left_anti")
    (certified, fallbackQ)
  }

  /** #342: exact Hamming top-K served MIH-style — banded candidates
    * first, exhaustive scan only for queries the pigeonhole certificate
    * cannot prove exact. Same result frame and DuckDB oracle as #159 by
    * construction (the certificate is sound, the fallback is complete).
    *
    * Honest scale note, measured on this corpus: the test embeddings'
    * sign bits are near-uniform (the K-th-neighbor distance is ≈ 22–25
    * of 64 bits at sf0.01–0.1), which is ABOVE any radius a pigeonhole
    * band can certify — on sign-random data every query takes the
    * fallback leg, and information-theoretically no exact method beats
    * the linear scan (#159's tier, FAISS IndexBinaryFlat's shape). The
    * banded tier is the corpus-proportional path for CLUSTERED
    * embedding spaces, where stage 1 resolves queries without touching
    * the full corpus (BinarizeMihSpec pins both regimes: a planted
    * clustered corpus certifies every query; random data falls back and
    * still returns the exact answer).
    */
  def mihTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = packed(spark, dir)
    val q = queriesOf(e)
    val (certified, fallbackQ) = mihSplit(e, q)
    ranked(certified).unionByName(ranked(exhaustiveTopK(e, fallbackQ)))
  }

  val hammingTopKSql: String = {
    def sig(lo: Int) =
      s"""list_reduce(list_transform(range(1, ${BitsPerWord + 1}),
      j -> CASE WHEN v[$lo + j] > 0.0 THEN (1::BIGINT << CAST(j - 1 AS INT)) ELSE 0::BIGINT END),
      (a, b) -> a | b)"""
    val ham = "bit_count(xor(e.sig_lo, q.sig_lo)) + bit_count(xor(e.sig_hi, q.sig_hi))"
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), sg AS (
       |  SELECT vec_id, ${sig(0)} AS sig_lo, ${sig(BitsPerWord)} AS sig_hi FROM ve
       |)
       |SELECT q_id, vec_id, hamming, rank FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    CAST($ham AS INT) AS hamming,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      $ham ASC, e.vec_id ASC) AS INT) AS rank
       |  FROM sg q JOIN sg e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id % ${Ann.QueryMod} = 0
       |) WHERE rank <= ${Ann.K}""".stripMargin
  }
}
