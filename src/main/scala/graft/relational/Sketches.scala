package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash, Tables}

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

  /** (word, mask) bit rows of a document frame — the per-element explode
    * shared by the batch build (which dedups elements first: fewer rows
    * to OR) and the STREAMING build (which deliberately does NOT dedup:
    * OR is idempotent, so duplicate elements cost a little work and
    * change nothing — which is also why the streaming state needs no
    * dropDuplicates buffer; see
    * [[graft.streaming.DocStreams.bloomState]]).
    */
  private[graft] def bloomElements(docs: DataFrame): DataFrame =
    docs.select(md5(lower(trim(col("text")))).as("e"))

  private[graft] def bloomMasks(el: DataFrame): DataFrame =
    el
      .select(explode(array((0 until BloomK).map { j =>
        PortableHash.pHash(concat(lit(s"bf$j|"), col("e"))) % BloomM
      }: _*)).as("bit"))
      .select(expr(s"bit DIV $BloomBitsPerWord").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(bit % $BloomBitsPerWord AS INT))")
          .as("mask"))

  /** Complete the occupied-word OR state to the full fixed-width word
    * table (empty words = 0) + the popcount column.
    */
  private[graft] def bloomComplete(occupied: DataFrame): DataFrame = {
    val spark = occupied.sparkSession
    spark.range(BloomWords).toDF("word")
      .join(occupied, Seq("word"), "left")
      .select(col("word"), coalesce(col("b"), lit(0L)).as("bits"))
      .withColumn("n_set", expr("bit_count(bits)"))
  }

  /** Filter state for any frame carrying `text` (spec shards reuse). */
  private[graft] def bloomOf(docs: DataFrame): DataFrame =
    bloomComplete(
      bloomMasks(bloomElements(docs).distinct())
        .groupBy("word").agg(expr("bit_or(mask)").as("b")))

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

  // ------------------------------------------------------------------ KMV

  /** KMV sketch size (k minimum values kept per set). */
  val KmvK = 64

  /** 2^60 — the pHash value space; exactly representable as a double. */
  private val KmvSpace: Double = 1152921504606846976.0

  /** #154: KMV / theta distinct sketch with SET OPERATIONS — the fourth
    * fixed-memory sketch, and the one with the capability the other
    * three lack: HLL registers union but cannot intersect; a KMV sketch
    * (the k SMALLEST hash values of a set — the theta-sketch family)
    * supports union (k smallest of the merged k-sets — proven equal to
    * the sketch of the true union, since any hash in min-k(A∪B) is in
    * min-k of its own side) AND intersection/Jaccard estimation (the
    * fraction of the union sketch's members lying in both input
    * sketches is an unbiased Jaccard estimate — the same estimator
    * MinHash dedup uses, applied to audience overlap). Here: viewers ∩
    * purchasers — the overlap question a marketing/e-commerce pipeline
    * asks of sets too large to intersect exactly.
    *
    * Estimators: n̂ = (k−1)·2^60 / h_k (the classic KMV unbiased
    * estimate; one correctly-rounded division), Ĵ = hits/k (dyadic —
    * exact), intersection n̂_∩ = Ĵ·n̂_∪ (one multiply). All mirrored in
    * literal order by the oracle, so the whole report is hash-exact.
    *
    * Plan: one scan builds per-user membership flags (map-side-combining
    * groupBy on user_id); each sketch is ORDER BY hash LIMIT k, which
    * Spark executes as TakeOrderedAndProject — per-partition k-element
    * heaps, only k rows per partition ever move (the distributed-build
    * story: partials ARE sketches and merge by min-k). The union sketch
    * merges the two k-sets, never re-touching the data. Truth counts
    * ride the same flags frame. Everything downstream of the heaps is
    * ≤ 3k rows.
    */
  def kmv(spark: SparkSession, dir: String): DataFrame = {
    val flags = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("fa"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("fb"))
      .withColumn("h", PortableHash.pHash(concat_ws("|", lit("kmv"), col("user_id"))))

    def sketch(f: DataFrame): DataFrame = f.select("h").orderBy("h").limit(KmvK)
    val skA = sketch(flags.filter(col("fa") === 1))
    val skB = sketch(flags.filter(col("fb") === 1))
    // Union sketch from the two k-sets alone (mergeability — the data is
    // NOT rescanned): distinct because a user can be in both sets.
    val skU = skA.union(skB).distinct().orderBy("h").limit(KmvK)
    val hits = skU.join(skA, Seq("h"), "left_semi")
      .join(skB, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("hits"))

    // Per-sketch summary (kth = max of the min-k set, n for the exact
    // regime: a sketch holding FEWER than k hashes has seen the whole
    // set, so the estimate is the exact count — the standard KMV rule).
    def summ(df: DataFrame, nm: String): DataFrame =
      df.agg(max("h").as(s"kth_$nm"), count(lit(1)).as(s"n_$nm"))
    val truth = flags.agg(
      sum("fa").as("true_a"), sum("fb").as("true_b"),
      count(lit(1)).as("true_u"),
      sum(col("fa") * col("fb")).as("true_i"))

    def est(nm: String): Column =
      when(col(s"n_$nm") < KmvK, col(s"n_$nm").cast("double"))
        .otherwise(lit((KmvK - 1).toDouble * KmvSpace) / col(s"kth_$nm").cast("double"))
    val jEst = col("hits").cast("double") / col("n_u").cast("double")

    summ(skA, "a").crossJoin(broadcast(summ(skB, "b")))
      .crossJoin(broadcast(summ(skU, "u")))
      .crossJoin(broadcast(hits))
      .crossJoin(broadcast(truth))
      .select(
        lit(KmvK).as("k"),
        col("kth_a"), est("a").as("est_a"), col("true_a"),
        col("kth_b"), est("b").as("est_b"), col("true_b"),
        col("kth_u"), est("u").as("est_u"), col("true_u"),
        col("hits"), jEst.as("j_est"),
        (jEst * est("u")).as("inter_est"),
        col("true_i"))
  }

  val kmvSql: String = {
    val estC = s"(${(KmvK - 1).toDouble} * 1152921504606846976.0)"
    def est(nm: String) =
      s"(CASE WHEN n_$nm < $KmvK THEN CAST(n_$nm AS DOUBLE) ELSE $estC / CAST(kth_$nm AS DOUBLE) END)"
    s"""WITH fl AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS fa,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS fb,
       |    ${PortableHash.duck("'kmv|' || user_id")} AS h
       |  FROM events WHERE event_type IN ('view', 'purchase')
       |  GROUP BY user_id
       |),
       |ska AS (SELECT h FROM fl WHERE fa = 1 ORDER BY h LIMIT $KmvK),
       |skb AS (SELECT h FROM fl WHERE fb = 1 ORDER BY h LIMIT $KmvK),
       |sku AS (
       |  SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
       |  ORDER BY h LIMIT $KmvK
       |),
       |sa AS (SELECT MAX(h) AS kth_a, COUNT(*) AS n_a FROM ska),
       |sb AS (SELECT MAX(h) AS kth_b, COUNT(*) AS n_b FROM skb),
       |su AS (SELECT MAX(h) AS kth_u, COUNT(*) AS n_u FROM sku),
       |hits AS (
       |  SELECT COUNT(*) AS hits FROM sku
       |  WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)
       |),
       |truth AS (
       |  SELECT CAST(SUM(fa) AS BIGINT) AS true_a, CAST(SUM(fb) AS BIGINT) AS true_b,
       |    COUNT(*) AS true_u, CAST(SUM(fa * fb) AS BIGINT) AS true_i
       |  FROM fl
       |)
       |SELECT $KmvK AS k,
       |  kth_a, ${est("a")} AS est_a, true_a,
       |  kth_b, ${est("b")} AS est_b, true_b,
       |  kth_u, ${est("u")} AS est_u, true_u,
       |  hits,
       |  CAST(hits AS DOUBLE) / CAST(n_u AS DOUBLE) AS j_est,
       |  (CAST(hits AS DOUBLE) / CAST(n_u AS DOUBLE)) * ${est("u")} AS inter_est,
       |  true_i
       |FROM sa, sb, su, hits, truth""".stripMargin
  }

  // ----------------------------------------------- #183 AMS F2 sketch

  /** 48 sign estimators in 6 groups of 8 — the classic medians-of-means
    * layout (Alon, Matias & Szegedy 1996 §2.2).
    */
  val AmsJ = 48
  val AmsGroups = 6
  val AmsPerGroup: Int = AmsJ / AmsGroups

  /** #183: the AMS second-frequency-moment sketch — the LAST member of
    * the sketch family (CM answers point frequency, HLL F0, Bloom
    * membership, KMV set ops; AMS answers F2 = Σ c_u², the SELF-JOIN
    * SIZE — the statistic a cost-based optimizer wants before planning
    * a user-keyed join, and the standard repeat-rate/skew gauge). Each
    * estimator j keeps z_j = Σ_u sign_j(u)·c_u with four-wise-ish signs
    * drawn from BIT j of one pHash per user — ONE md5 per event feeds
    * all 48 estimators; E[z²] = F2. The estimate is the textbook
    * median-of-means: group sums of z² (6 groups of 8), nearest-rank
    * median, ONE division at the end.
    *
    * Exactness: z_j, z², group sums, the true F2 and the median are ALL
    * exact integers — the only doubles are the final est = med/8 and
    * rel_err divisions. Merge = vector ADDITION of the 48-long z state
    * (micro-batch partials, shard unions and the streaming update are
    * the same +), like the CM matrix.
    *
    * Scale: state is 48 longs — CONSTANT in corpus size; the per-event
    * explode emits 48 partials that combine map-side (shuffle bytes =
    * 48 keys per partition); the true-F2 pass is one user-keyed
    * aggregate. Output: ONE summary row.
    */
  /** The 48-long z state from any (possibly streaming) frame with a
    * user_id column — shared by the batch estimator and the #184
    * streaming variant so both maintain the IDENTICAL state.
    */
  private[graft] def amsZ(events: DataFrame): DataFrame =
    // Materialize the hash FIRST: built inline, the 48 array elements
    // would each re-evaluate the md5 chain (CollapseProject only inlines
    // cheap exprs, but the lambda-free array construction is one
    // projection — measured 48 md5s/row). As its own column the digest
    // is computed once and the 48 sign taps are bit ops on a long.
    events
      .select(PortableHash.pHash(
        concat_ws("|", lit("ams"), col("user_id"))).as("h"))
      .select(posexplode(array((0 until AmsJ).map(j =>
        lit(1L) - lit(2L) * shiftright(col("h"), j).bitwiseAND(lit(1L))): _*))
        .as(Seq("j", "sign")))
      .groupBy("j").agg(sum("sign").as("z"))

  /** Oracle for the raw z table (shared with the streaming variant). */
  val amsZSql: String = {
    val h = PortableHash.duck("'ams|' || user_id")
    s"""WITH signs AS (
       |  SELECT j, 1 - 2 * (($h >> j) & 1) AS sign
       |  FROM events, (SELECT unnest(range($AmsJ)) AS j)
       |)
       |SELECT CAST(j AS INT) AS j, CAST(SUM(sign) AS BIGINT) AS z
       |FROM signs GROUP BY j""".stripMargin
  }

  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    val z = amsZ(Tables.events(spark, dir))
    val gsums = z.groupBy((col("j") / AmsPerGroup).cast("long").as("g"))
      .agg(sum(col("z") * col("z")).as("gsum"))
    // nearest-rank median via TakeOrdered (house rule: no unpartitioned
    // window): the ⌈G/2⌉-th smallest gsum = max of the first ⌈G/2⌉ rows
    // in (gsum, g) order.
    val med = gsums.orderBy(col("gsum").asc, col("g").asc)
      .limit((AmsGroups + 1) / 2)
      .agg(max("gsum").as("med_gsum"))
    val truth = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_users"), sum("c").as("n_events"),
        sum(col("c") * col("c")).as("f2_true"))
    truth.crossJoin(broadcast(med))
      .select(col("n_events"), col("n_users"), col("f2_true"),
        col("med_gsum"),
        (col("med_gsum").cast("double") / AmsPerGroup).as("f2_est"),
        (abs(col("med_gsum").cast("double") / AmsPerGroup
          - col("f2_true").cast("double")) /
          col("f2_true").cast("double")).as("rel_err"))
  }

  val amsF2Sql: String = {
    val h = PortableHash.duck("'ams|' || user_id")
    s"""WITH signs AS (
       |  SELECT j, 1 - 2 * (($h >> j) & 1) AS sign
       |  FROM events, (SELECT unnest(range($AmsJ)) AS j)
       |), z AS (
       |  SELECT j, CAST(SUM(sign) AS BIGINT) AS z FROM signs GROUP BY j
       |), gsums AS (
       |  SELECT j // $AmsPerGroup AS g, CAST(SUM(z * z) AS BIGINT) AS gsum
       |  FROM z GROUP BY 1
       |), med AS (
       |  SELECT MAX(gsum) AS med_gsum FROM (
       |    SELECT gsum FROM gsums ORDER BY gsum, g LIMIT ${(AmsGroups + 1) / 2}
       |  )
       |), truth AS (
       |  SELECT COUNT(*) AS n_users,
       |    CAST(SUM(c) AS BIGINT) AS n_events,
       |    CAST(SUM(c * c) AS BIGINT) AS f2_true
       |  FROM (SELECT COUNT(*) AS c FROM events GROUP BY user_id)
       |)
       |SELECT n_events, n_users, f2_true, med_gsum,
       |  CAST(med_gsum AS DOUBLE) / $AmsPerGroup AS f2_est,
       |  abs(CAST(med_gsum AS DOUBLE) / $AmsPerGroup
       |    - CAST(f2_true AS DOUBLE)) / CAST(f2_true AS DOUBLE) AS rel_err
       |FROM truth, med""".stripMargin
  }

  // ------------------------- #201 bucketed-min KMV (streaming state)

  /** Bucket count for the stochastic-averaging KMV variant. */
  val KmvM = 64

  /** Bottom-1-per-bucket distinct sketch state (shared by the streaming
    * variant): hash each key, split the hash into a bucket (mod
    * [[KmvM]]) and keep the per-bucket MINIMUM. This is KMV under
    * stochastic averaging — where the batch #154 keeps the exact
    * bottom-k set (which streaming state can't maintain incrementally
    * without a sort), the bucketed form is a pure per-key MIN: merge =
    * component-wise min, which is IDEMPOTENT — replayed or duplicated
    * events cannot move a minimum, putting this sketch in the
    * HLL/Bloom replay-safe class where exact bottom-k (insert-once
    * semantics) is not. State ≤ [[KmvM]] rows forever.
    */
  private[graft] def kmvBucketMins(events: DataFrame): DataFrame =
    events
      .select(PortableHash.pHash(
        concat_ws("|", lit("kmvs"), col("user_id"))).as("h"))
      .groupBy((col("h") % KmvM).cast("int").as("bucket"))
      .agg(min("h").as("minh"))

  /** Oracle for the bucket-min state (shared with the streaming op). */
  val kmvBucketMinsSql: String = {
    val h = PortableHash.duck("'kmvs|' || user_id")
    s"""SELECT CAST(h % $KmvM AS INT) AS bucket, MIN(h) AS minh
       |FROM (SELECT $h AS h FROM events)
       |GROUP BY 1""".stripMargin
  }

  // ----------------------------------------------- #262 moments sketch

  /** #262: MOMENTS SKETCH — the power-sum summary (n, Σx, Σx², Σx³,
    * Σx⁴) per event type, and the shape statistics it determines:
    * mean, variance, skewness, excess kurtosis. This is the EXACT
    * member of the sketch family (#91/#92/#154/#201 approximate;
    * power sums are lossless for moments): five numbers per group
    * capture the full moment profile, and — the sketch property —
    * they merge by plain ADDITION, so per-executor partials, shard
    * unions and day-over-day rollups compose with no error term at
    * all (SketchesSpec proves shard-merge ≡ monolithic). The Gan et
    * al. VLDB'18 "Moment-based quantile sketches" aggregator is this
    * state + a quantile solver; the state is what a warehouse stores.
    *
    * Exactness: `value` sits on the cents grid (≤ 490.02), so the
    * per-row powers are correctly-rounded IEEE products bounded by
    * 490.02⁴ ≈ 5.8e10 — quantized per the house scaled-double rule at
    * scales (2, 4, 3, 2), every scaled power stays under 2^53. Group-
    * sum widths are WORST-CASE budgeted (ADVICE r6): q1–q3 peak at
    * ≤ 1.2e8 per row → BIGINT holds ~7.6e10 max-valued rows per group;
    * q4 peaks at 5.8e12 per row, which BIGINT only carries to ~1.6e6
    * max-valued rows — so q4 alone accumulates as DECIMAL(30,0)
    * (~1.7e17 max-valued rows), keeping the merge-by-addition law
    * exact at any realistic group size. The
    * derived statistics are a handful of IEEE ops on bit-identical
    * exact sums — order-free by construction. Variance/skew/kurtosis
    * use the population (biased) form, the one power sums determine
    * directly: µ_k = m_k − f(m_{<k}) via the binomial expansion.
    *
    * Scale: ONE map-side-combining aggregate onto the 5-key event-type
    * space — shuffle bytes constant in corpus size, the sketch
    * guarantee. No second pass: central moments come from raw moments,
    * never from re-scanning deviations (the textbook two-pass form
    * shuffles the corpus twice for nothing).
    */
  private[graft] def momentState(events: DataFrame): DataFrame = {
    def qsum(c: Column, scale: Double) =
      sum(floor(c * scale + 0.5).cast("long"))
    events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      qsum(col("value"), 1e2).as("q1"),
      qsum(col("value") * col("value"), 1e4).as("q2"),
      qsum(col("value") * col("value") * col("value"), 1e3).as("q3"),
      // q4's per-row magnitude (≤ 5.8e12 scaled) exhausts BIGINT at
      // ~1.6e6 max-valued rows — wide accumulator (see scaladoc)
      sum(floor(col("value") * col("value") * col("value")
        * col("value") * 1e2 + 0.5).cast("decimal(20,0)")).as("q4"))
  }

  def moments(spark: SparkSession, dir: String): DataFrame =
    momentStats(momentState(Tables.events(spark, dir)))

  /** Shape stats from the power-sum state (shared with the merge spec).
    * The persisted/merged state is the SCALED BIGINT sums — integers
    * add exactly under any shard split; the divide-back to value units
    * happens only here, at read time (dividing first and summing the
    * doubles would lose the merge law in the last ulp — measured).
    */
  private[graft] def momentStats(state: DataFrame): DataFrame =
    state
      .withColumn("s1", col("q1").cast("double") / 1e2)
      .withColumn("s2", col("q2").cast("double") / 1e4)
      .withColumn("s3", col("q3").cast("double") / 1e3)
      .withColumn("s4", col("q4").cast("double") / 1e2)
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("m2", col("s2") / col("n") - col("mean") * col("mean"))
      .withColumn("m3", col("s3") / col("n")
        - lit(3.0) * col("mean") * (col("s2") / col("n"))
        + lit(2.0) * col("mean") * col("mean") * col("mean"))
      .withColumn("m4", col("s4") / col("n")
        - lit(4.0) * col("mean") * (col("s3") / col("n"))
        + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n"))
        - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      .select(col("event_type"), col("n"), col("s1"), col("s2"),
        col("s3"), col("s4"), col("mean"),
        col("m2").as("variance"),
        (col("m3") / sqrt(col("m2") * col("m2") * col("m2"))).as("skewness"),
        (col("m4") / (col("m2") * col("m2")) - lit(3.0)).as("kurtosis_ex"))

  val momentsSql: String = {
    val s1 = Exact.duckSum("value", 2)
    val s2 = Exact.duckSum("value * value", 4)
    val s3 = Exact.duckSum("value * value * value", 3)
    val s4 = Exact.duckSum("value * value * value * value", 2)
    s"""WITH st AS (
       |  SELECT event_type, COUNT(*) AS n,
       |    $s1 AS s1, $s2 AS s2, $s3 AS s3, $s4 AS s4
       |  FROM events GROUP BY 1
       |), d AS (
       |  SELECT *, s1 / n AS mean FROM st
       |), m AS (
       |  SELECT *,
       |    s2 / n - mean * mean AS m2,
       |    s3 / n - 3.0 * mean * (s2 / n)
       |      + 2.0 * mean * mean * mean AS m3,
       |    s4 / n - 4.0 * mean * (s3 / n)
       |      + 6.0 * mean * mean * (s2 / n)
       |      - 3.0 * mean * mean * mean * mean AS m4
       |  FROM d
       |)
       |SELECT event_type, n, s1, s2, s3, s4, mean,
       |  m2 AS variance,
       |  m3 / sqrt(m2 * m2 * m2) AS skewness,
       |  m4 / (m2 * m2) - 3.0 AS kurtosis_ex
       |FROM m""".stripMargin
  }

  // ----------------------------------- #321 grid-CDF quantile sketch

  /** The quantile targets, as exact rationals so the nearest-rank pick
    * is pure integer arithmetic in both engines.
    */
  private[graft] val QuantileQs: Seq[(String, Long, Long)] =
    Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p95", 19L, 20L),
      ("p99", 99L, 100L))

  /** Sketch state for [[quantileSketch]]: per (event_type, cent cell)
    * counts. Bounded by the VALUE DOMAIN (the cent grid of a capped
    * metric — ≤ ~49k cells/type here), not the data; partials and
    * shards merge by plain ADDITION like #262's power sums, which is
    * what makes it a sketch: per-executor partials, per-day states, and
    * cross-datacenter shards all combine without re-touching events.
    */
  private[graft] def quantileState(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Readout shared by the op and the merge spec: nearest-rank
    * quantiles (rank = ⌈q·n⌉ via integer cross-multiplication) off the
    * per-type cumulative cell counts.
    */
  private[graft] def quantileReadout(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perType = Window.partitionBy("event_type")
    val cum = state
      .withColumn("cum", sum(col("cnt")).over(perType.orderBy("cell")))
      .withColumn("n", sum(col("cnt")).over(perType))
    val qdf = broadcast(state.sparkSession
      .createDataFrame(QuantileQs).toDF("q", "qnum", "qden"))
    cum.join(qdf,
        col("cum") >= expr("(qnum * n + qden - 1) DIV qden"))
      .groupBy("event_type", "q")
      .agg(max(col("n")).as("n"),
        max(expr("(qnum * n + qden - 1) DIV qden")).as("rnk"),
        (min(col("cell")).cast("double") / 100.0).as("value"))
  }

  /** #321: MERGEABLE QUANTILE SKETCH (fixed value-grid CDF) — the
    * distribution sketch completing the family: #91/#154 answer
    * distinct-count, #92 frequency, #262 moments; this answers "what is
    * p99?" from state that MERGES. #108 computes exact R-7 quantiles
    * with a full pass; at 100 TB the operational need is different —
    * per-shard/per-day states that combine by addition into any rollup
    * (hour→day→month) with quantiles read from the merged state alone.
    * On a cent-grid-bounded metric the grid CDF is EXACT (every KLL/
    * t-digest would only approximate it) and its state is bounded by
    * the domain, not the data — the honest fixed-universe trade,
    * documented: an unbounded-domain metric needs a coarser grid or a
    * compacting sketch.
    *
    * Scale: the state build is one map-side-combining aggregate onto
    * the (type, cell) keyspace; the readout's running sum is a window
    * over the DOMAIN-bounded state frame (≤49k rows/type — never data-
    * scale); the 4 rank picks are an integer-threshold join against a
    * 4-row broadcast. Exactness: counts and cross-multiplied ranks are
    * pure integers; the only division is the final cell→value literal.
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame =
    quantileReadout(quantileState(Tables.events(spark, dir)))

  val quantileSketchSql: String = {
    val qRows = QuantileQs.map { case (q, nu, de) => s"('$q', $nu, $de)" }
      .mkString(", ")
    s"""WITH st AS (
       |  SELECT event_type,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cell,
       |    COUNT(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |), c AS (
       |  SELECT event_type, cell, cnt,
       |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY cell) AS cum,
       |    SUM(cnt) OVER (PARTITION BY event_type) AS n
       |  FROM st
       |), q AS (
       |  SELECT * FROM (VALUES $qRows) AS t(q, qnum, qden)
       |)
       |SELECT event_type, q, CAST(MAX(n) AS BIGINT) AS n,
       |  CAST(MAX((qnum * n + qden - 1) // qden) AS BIGINT) AS rnk,
       |  CAST(MIN(cell) AS DOUBLE) / 100.0 AS value
       |FROM c JOIN q ON cum >= (qnum * n + qden - 1) // qden
       |GROUP BY 1, 2""".stripMargin
  }
}
