package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** Distributed streaming sketches over the event log — the two
  * fixed-memory primitives a 100 TB pipeline leans on when exact
  * distinct/frequency state no longer fits: HyperLogLog registers and a
  * Count-Min frequency matrix. Both are DETERMINISTIC here (bucket and
  * rank derive from the portable hash), so unlike library sketch impls
  * the full register/cell state is oracle-checkable bit-for-bit.
  *
  * Scale shape (the whole point of a sketch): state is O(m), not O(n) —
  * each is one map-side-combining groupBy onto a few hundred keys, so
  * shuffle bytes are CONSTANT in corpus size; registers/cells merge by
  * max/sum, which is exactly how per-executor partials combine, and how
  * two clusters' sketches union.
  */
object Sketches {

  // ------------------------------------------------------------------ HLL

  /** Register count m = 2^8. */
  val HllM = 256

  /** Flajolet et al.'s α_m bias constant for m = 256, folded to one
    * double here and interpolated verbatim into the oracle SQL.
    */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  /** The single-division estimator constant α·m²·2^53 (the 2^53 undoes
    * the integer scaling of the register sum, one correctly-rounded
    * division total — two divisions would round differently than one).
    */
  private val HllEstC: Double = HllAlpha * (HllM.toDouble * HllM) * 9007199254740992.0

  /** #91: HyperLogLog distinct-user estimate, registers built exactly:
    * bucket = top 8 bits of the 60-bit pHash, rank = leading-zero count
    * of the remaining 52 bits + 1 (via the minimal binary-string length,
    * identical in both engines), register = max rank per bucket, empty
    * buckets rank 0. The register sum Σ 2^(−r) is kept EXACT by scaling
    * to integers (2^(53−r) is a bit shift, summed as BIGINT) — summing
    * the dyadic 2^(−r) doubles directly would be order-dependent once
    * 1 + 2^(−53) exceeds the mantissa. Output: one row with the register
    * state summary, the raw estimate, the small-range-corrected estimate
    * (standard linear counting m·ln(m/V) when raw ≤ 2.5m and empty
    * buckets exist — ln is the one transcendental, so its output is
    * grid-quantized per the house rule; the branch condition compares
    * engine-identical values), and the true count beside it.
    */
  /** Per-bucket max-rank registers from any frame carrying `user_id` —
    * shared by the batch estimator below and the streaming register
    * state ([[graft.streaming.EventStreams.hllRegisters]]).
    */
  private[graft] def hllPerBucket(events: DataFrame): DataFrame =
    events.select(PortableHash.pHash(
        concat_ws("|", lit("hll"), col("user_id"))).as("h"))
      .select(expr("h DIV 4503599627370496").as("bucket"),
        expr("h % 4503599627370496").as("w"))
      .withColumn("r",
        when(col("w") === 0, lit(53)).otherwise(lit(53) - length(bin(col("w")))))
      .groupBy("bucket").agg(max("r").as("r"))

  def hll(spark: SparkSession, dir: String): DataFrame = {
    val perBucket = hllPerBucket(Tables.events(spark, dir))
    val regs = spark.range(HllM).toDF("bucket")
      .join(perBucket, Seq("bucket"), "left")
      .select(coalesce(col("r"), lit(0)).as("r"))
    val sketch = regs.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - r)")).as("zsum"),
      sum(when(col("r") === 0, 1L).otherwise(0L)).as("v_empty"),
      max("r").as("r_max"))
    val truth = Tables.events(spark, dir)
      .agg(countDistinct("user_id").as("n_users"))
    sketch.crossJoin(broadcast(truth))
      .withColumn("raw_est", lit(HllEstC) / col("zsum").cast("double"))
      .select(lit(HllM).as("m"), col("zsum"), col("v_empty"), col("r_max"),
        col("raw_est"),
        when(col("v_empty") > 0 && col("raw_est") <= lit(2.5 * HllM),
          graft.core.Exact.roundS(
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_empty").cast("double")), 6))
          .otherwise(col("raw_est")).as("hll_est"),
        col("n_users"))
  }

  /** Register-build CTE chain (alias `pb`) — shared with the streaming
    * register oracle.
    */
  private[graft] val hllPbCtes: String =
    s"""h AS (
       |  SELECT ${PortableHash.duck("'hll|' || user_id")} AS h FROM events
       |), e AS (
       |  SELECT h // 4503599627370496 AS bucket, h % 4503599627370496 AS w FROM h
       |), pb AS (
       |  SELECT bucket,
       |    MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS r
       |  FROM e GROUP BY bucket
       |)""".stripMargin

  val hllSql: String =
    s"""WITH $hllPbCtes, regs AS (
       |  SELECT COALESCE(pb.r, 0) AS r
       |  FROM (SELECT unnest(range(0, $HllM)) AS bucket) b LEFT JOIN pb USING (bucket)
       |), s AS (
       |  SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT) AS zsum,
       |    CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
       |    MAX(r) AS r_max
       |  FROM regs
       |)
       |SELECT $HllM AS m, zsum, v_empty, r_max,
       |  $HllEstC / CAST(zsum AS DOUBLE) AS raw_est,
       |  CASE WHEN v_empty > 0 AND $HllEstC / CAST(zsum AS DOUBLE) <= ${2.5 * HllM}
       |    THEN ${graft.core.Exact.duckRoundS(
      s"$HllM.0 * ln($HllM.0 / CAST(v_empty AS DOUBLE))", 6)}
       |    ELSE $HllEstC / CAST(zsum AS DOUBLE) END AS hll_est,
       |  (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users
       |FROM s""".stripMargin

  // ------------------------------------------------------------ Count-Min

  val CmDepth = 4
  val CmWidth = 256

  /** #92: Count-Min frequency sketch of per-user event counts — depth 4
    * independent hash rows × width 256, the full cell matrix emitted
    * (only nonempty cells, as any GROUP BY would). One scan, one
    * posexplode (4 rows per event), one 1024-key aggregate; estimates
    * are min over the depth cells and only ever overestimate (spec
    * checks the guarantee against true counts).
    */
  def countMin(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(posexplode(array((0 until CmDepth).map { d =>
        PortableHash.pHash(
          concat_ws("|", lit(s"cm$d"), col("user_id"))) % CmWidth
      }: _*)).as(Seq("depth", "bucket")))
      .groupBy("depth", "bucket")
      .agg(count(lit(1)).as("cnt"))

  val countMinSql: String =
    s"""SELECT CAST(d AS INT) AS depth,
       |  ${PortableHash.duck("'cm' || d || '|' || user_id")} % $CmWidth AS bucket,
       |  COUNT(*) AS cnt
       |FROM events, (SELECT unnest(range(0, $CmDepth)) AS d)
       |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------------- Bloom

  val BloomWords = 64
  val BloomBitsPerWord = 62 // ≤ 62 keeps every mask positive in int64
  val BloomK = 5
  val BloomM: Int = BloomWords * BloomBitsPerWord

  /** #128: BLOOM FILTER over document content hashes — the third
    * fixed-memory sketch next to HLL (#91, distinct counts) and
    * Count-Min (#92, frequencies): constant-space MEMBERSHIP. The
    * pipeline use is decontamination and cross-corpus dedup at scale:
    * #62 broadcasts the exact eval-gram hash set, which stops fitting
    * when the reference corpus is itself huge — a Bloom filter holds a
    * billion-element membership test in a few GB with a controlled
    * false-positive rate, never a false negative.
    *
    * State = [[BloomWords]] int64 words ([[BloomBitsPerWord]] usable
    * bits each — masks stay positive, so no sign-bit portability
    * hazard); k = [[BloomK]] pHash-derived bit positions per element.
    * Build is one scan + a [[BloomWords]]-key `bit_or` aggregate —
    * shuffle bytes CONSTANT in corpus size; partials merge by OR, which
    * is idempotent AND commutative, so executor partials, two shards'
    * filters, and at-least-once replays all combine exactly (the same
    * argument as HLL's max-merge; SketchesSpec proves the shard-union
    * claim and measures the false-positive rate against (1−e^(−kn/m))^k).
    * Emits the full word state (word, bits, n_set) — oracle-checkable
    * bit-for-bit like the other sketches.
    */
  def bloom(spark: SparkSession, dir: String): DataFrame =
    bloomOf(Tables.documents(spark, dir))

  /** Filter state for any frame carrying `text` (spec shards reuse). */
  private[graft] def bloomOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(md5(lower(trim(col("text")))).as("e")).distinct()
      .select(explode(array((0 until BloomK).map { j =>
        PortableHash.pHash(concat(lit(s"bf$j|"), col("e"))) % BloomM
      }: _*)).as("bit"))
      .select(expr(s"bit DIV $BloomBitsPerWord").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(bit % $BloomBitsPerWord AS INT))")
          .as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("b"))
    spark.range(BloomWords).toDF("word")
      .join(words, Seq("word"), "left")
      .select(col("word"), coalesce(col("b"), lit(0L)).as("bits"))
      .withColumn("n_set", expr("bit_count(bits)"))
  }

  /** The k bit positions of one element (driver-side; spec probes). */
  private[graft] def bloomBits(e: String): Seq[(Long, Long)] =
    (0 until BloomK).map { j =>
      val bit = PortableHash.pHashJvm(s"bf$j|$e") % BloomM
      (bit / BloomBitsPerWord, 1L << (bit % BloomBitsPerWord).toInt)
    }

  val bloomSql: String =
    s"""WITH el AS (SELECT DISTINCT md5(lower(trim(text))) AS e FROM documents),
       |bits AS (
       |  SELECT ${PortableHash.duck("'bf' || j || '|' || e")} % $BloomM AS bit
       |  FROM el, (SELECT unnest(range(0, $BloomK)) AS j)
       |),
       |w AS (
       |  SELECT bit // $BloomBitsPerWord AS word,
       |    bit_or(1::BIGINT << CAST(bit % $BloomBitsPerWord AS INT)) AS b
       |  FROM bits GROUP BY 1
       |)
       |SELECT r.word, COALESCE(w.b, 0) AS bits,
       |  CAST(bit_count(COALESCE(w.b, 0)) AS INT) AS n_set
       |FROM (SELECT unnest(range(0, $BloomWords)) AS word) r
       |LEFT JOIN w USING (word)""".stripMargin
}
