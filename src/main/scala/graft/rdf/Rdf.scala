package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, TpchGraph}

/** RDF surface operators: triple extraction, N-Triples round-trip,
  * COO tensor stats, deterministic negative sampling.
  *
  * Reference: the N-Triples line parser at
  * python/sansa/ml/kbc/rdfio.py:42-50 (regex split, URI filter) and
  * RDFDatasetReader.scala:20-26 (`isValidTriple` keeps URI-only triples);
  * negative sampling at python/sansa/ml/kbc/keras/sample.py:29-47
  * (RandomModeSampler corrupts the object slot) and TransE.scala:92-93.
  */
object Rdf {

  /** #6: the TPC-H graph triple view itself (s, p, o strings). */
  def triplesExtract(spark: SparkSession, dir: String): DataFrame =
    TpchGraph.triples(spark, dir)

  val triplesExtractSql: String =
    s"WITH ${TpchGraph.cte}\nSELECT s, p, o FROM triples"

  // ------------------------------------------------------------- N-Triples

  private val ntPattern = "^<urn:g/r/([^>]+)> <urn:g/p/([^>]+)> <urn:g/r/([^>]+)> \\.$"

  /** Format triples as N-Triples lines (one string column `line`). */
  def toNtriples(triples: DataFrame): DataFrame =
    triples.select(concat(
      lit("<urn:g/r/"), col("s"), lit("> <urn:g/p/"), col("p"),
      lit("> <urn:g/r/"), col("o"), lit("> .")).as("line"))

  /** Parse N-Triples lines back to (s, p, o); malformed lines dropped
    * (rdfio.py:46-50 drops non-matching lines the same way).
    */
  def parseNtriples(lines: DataFrame): DataFrame =
    lines
      .withColumn("s", regexp_extract(col("line"), ntPattern, 1))
      .withColumn("p", regexp_extract(col("line"), ntPattern, 2))
      .withColumn("o", regexp_extract(col("line"), ntPattern, 3))
      .filter(col("s") =!= "")
      .select("s", "p", "o")

  /** #7: format → parse round trip; result must equal the triple set. */
  def ntriplesRoundtrip(spark: SparkSession, dir: String): DataFrame =
    parseNtriples(toNtriples(TpchGraph.triples(spark, dir)))

  val ntriplesRoundtripSql: String =
    s"""WITH ${TpchGraph.cte},
       |lines AS (
       |  SELECT '<urn:g/r/' || s || '> <urn:g/p/' || p || '> <urn:g/r/' || o || '> .' AS line
       |  FROM triples
       |)
       |SELECT regexp_extract(line, '$ntPattern', 1) AS s,
       |       regexp_extract(line, '$ntPattern', 2) AS p,
       |       regexp_extract(line, '$ntPattern', 3) AS o
       |FROM lines
       |WHERE regexp_extract(line, '$ntPattern', 1) <> ''""".stripMargin

  // ------------------------------------------------------------ COO stats

  /** #11: per-relation slice statistics of the boolean COO tensor:
    * nnz, distinct subjects/objects, slice density. The groupBy key is
    * `pid` (~1e3 relations) — one small-key shuffle; the distinct counts
    * are exact (per-slice, not approximate) since slices are the unit a
    * partitioner would use (rdfio.py:11-34 ThreeWayTensorPartitioner
    * blocks on exactly these coordinates).
    */
  def cooStats(spark: SparkSession, dir: String): DataFrame =
    Dict.encodedTriples(spark, dir)
      .groupBy("pid")
      .agg(
        count(lit(1)).as("nnz"),
        countDistinct("sid").as("n_subj"),
        countDistinct("oid").as("n_obj"))
      .withColumn("density",
        col("nnz").cast("double") / (col("n_subj") * col("n_obj")))

  val cooStatsSql: String =
    s"""${Dict.preludeCtes}
       |SELECT pid, COUNT(*) AS nnz,
       |  COUNT(DISTINCT sid) AS n_subj, COUNT(DISTINCT oid) AS n_obj,
       |  CAST(COUNT(*) AS DOUBLE) / (COUNT(DISTINCT sid) * COUNT(DISTINCT oid)) AS density
       |FROM encoded GROUP BY pid""".stripMargin

  // ----------------------------------------------------- negative sampling

  /** #12: deterministic object corruption — the Spark-first analog of
    * RandomModeSampler (sample.py:39-47): replace the object with a
    * pHash-derived entity id; bump by one (mod N) on collision with the
    * true object so every negative is guaranteed corrupt.
    */
  def negSampleCorrupt(spark: SparkSession, dir: String): DataFrame = {
    val enc = Dict.encodedTriples(spark, dir)
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val raw = PortableHash.pHash(
      concat_ws("|", lit("neg"), col("sid"), col("pid"), col("oid"))) % col("n_ent")
    enc.crossJoin(broadcast(n))
      .withColumn("neg_oid",
        when(raw === col("oid"), (raw + 1) % col("n_ent")).otherwise(raw))
      .select("sid", "pid", "oid", "neg_oid")
  }

  val negSampleCorruptSql: String = {
    val raw = s"${PortableHash.duck("'neg|' || sid || '|' || pid || '|' || oid")} % n_ent"
    s"""${Dict.preludeCtes},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities)
       |SELECT sid, pid, oid,
       |  CASE WHEN ($raw) = oid THEN (($raw) + 1) % n_ent ELSE ($raw) END AS neg_oid
       |FROM encoded, n""".stripMargin
  }

  /** #40: LCWA negative sampling — the local-closed-world variant
    * (sample.py:95-110 `LCWASampler`): corrupt the SUBJECT slot, and keep
    * only corruptions whose (neg_sid, pid) pair is itself observed as a
    * (subject, relation) pair in the graph (`counts[(s, p)] > 0`) — the
    * negatives stay type-plausible.
    *
    * Spark-first: the plausibility filter is a left-semi join against the
    * distinct (sid, pid) pairs, keyed exactly like the groupBys around it
    * — one shuffle, no driver-side `counts` dict. The reference retries
    * until a plausible corruption is found; the deterministic analog
    * filters instead (a negative-per-triple RATE, not a guarantee —
    * matching the reference's `ntries`-bounded behavior, which also
    * yields < n samples when unlucky).
    */
  def negSampleLcwa(spark: SparkSession, dir: String): DataFrame = {
    val enc = Dict.encodedTriples(spark, dir)
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val raw = PortableHash.pHash(
      concat_ws("|", lit("lcwa"), col("sid"), col("pid"), col("oid"))) % col("n_ent")
    val corrupted = enc.crossJoin(broadcast(n))
      .withColumn("neg_sid",
        when(raw === col("sid"), (raw + 1) % col("n_ent")).otherwise(raw))
      .select("sid", "pid", "oid", "neg_sid")
    val observedHeads = enc.select(col("sid").as("neg_sid"), col("pid")).distinct()
    corrupted.join(observedHeads, Seq("neg_sid", "pid"), "left_semi")
      // the reference sampler (sample.py LCWASampler) also rejects any
      // corruption that IS an observed positive (`tuple(nex) not in
      // self.xs`) — without this, known-true triples leak out as
      // negatives (ADVICE r3)
      .join(enc.select(col("sid").as("neg_sid"), col("pid"), col("oid")),
        Seq("neg_sid", "pid", "oid"), "left_anti")
      .select("sid", "pid", "oid", "neg_sid")
  }

  val negSampleLcwaSql: String = {
    val raw = s"${PortableHash.duck("'lcwa|' || sid || '|' || pid || '|' || oid")} % n_ent"
    s"""${Dict.preludeCtes},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |corrupted AS (
       |  SELECT sid, pid, oid,
       |    CASE WHEN ($raw) = sid THEN (($raw) + 1) % n_ent ELSE ($raw) END AS neg_sid
       |  FROM encoded, n
       |)
       |SELECT c.sid, c.pid, c.oid, c.neg_sid
       |FROM corrupted c
       |WHERE EXISTS (SELECT 1 FROM encoded e
       |              WHERE e.sid = c.neg_sid AND e.pid = c.pid)
       |  AND NOT EXISTS (SELECT 1 FROM encoded e
       |                  WHERE e.sid = c.neg_sid AND e.pid = c.pid
       |                    AND e.oid = c.oid)""".stripMargin
  }

  // ------------------------------------------- relation cardinality types

  /** #169: Bordes relation categorization — the 1-1 / 1-N / N-1 / N-N
    * table every KGE paper since TransE reports per-category results
    * over (Bordes et al. 2013 §5.1; threshold 1.5): per relation, the
    * average tails-per-head `tph = n_triples / n_heads` and
    * heads-per-tail `hpt = n_triples / n_tails`, categorized by the
    * 1.5 cut on each axis. This is also the statistic the Bernoulli
    * sampler (#170) draws its head/tail corruption bias from.
    *
    * Scale: one groupBy(pid) pass — the distinct counts plan through a
    * single Expand, so the triple store is scanned once; output is
    * relation-dictionary-sized. Exactness: tph/hpt are ONE integer/
    * integer IEEE division each (no sums of floats), so the doubles are
    * engine-identical.
    */
  /** Dictionary-sized (|relations| rows) but data-scale to compute
    * (full-graph groupBy with two distinct counts) — derived-tier
    * cached (r11): #169 itself and #314's broadcast side both read it,
    * and #314 otherwise re-paid the graph scan per invocation.
    */
  private val relCatsCache = new graft.core.DfCache[(SparkSession, String)]

  def relationCats(spark: SparkSession, dir: String): DataFrame =
    relCatsCache.getOrElseUpdate((spark, dir))(relationCatsBuild(spark, dir))

  private def relationCatsBuild(spark: SparkSession, dir: String): DataFrame =
    Dict.encodedTriples(spark, dir)
      .groupBy("pid")
      .agg(
        count(lit(1)).as("n_triples"),
        countDistinct("sid").as("n_heads"),
        countDistinct("oid").as("n_tails"))
      .withColumn("tph", col("n_triples").cast("double") / col("n_heads"))
      .withColumn("hpt", col("n_triples").cast("double") / col("n_tails"))
      .withColumn("category",
        when(col("tph") < 1.5 && col("hpt") < 1.5, "1-1")
          .when(col("tph") >= 1.5 && col("hpt") < 1.5, "1-N")
          .when(col("tph") < 1.5 && col("hpt") >= 1.5, "N-1")
          .otherwise("N-N"))

  val relationCatsSql: String =
    s"""${Dict.preludeCtes}
       |SELECT pid, COUNT(*) AS n_triples,
       |  COUNT(DISTINCT sid) AS n_heads, COUNT(DISTINCT oid) AS n_tails,
       |  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT sid) AS tph,
       |  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT oid) AS hpt,
       |  CASE
       |    WHEN CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT sid) < 1.5
       |     AND CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT oid) < 1.5 THEN '1-1'
       |    WHEN CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT sid) >= 1.5
       |     AND CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT oid) < 1.5 THEN '1-N'
       |    WHEN CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT sid) < 1.5
       |     AND CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT oid) >= 1.5 THEN 'N-1'
       |    ELSE 'N-N'
       |  END AS category
       |FROM encoded GROUP BY pid""".stripMargin

  // ------------------------------------------- Bernoulli (bern) sampling

  /** #170: Bernoulli negative sampling (Wang et al. 2014, TransH §3.3,
    * the "bern" setting every later KGE paper toggles): corrupt the HEAD
    * with probability tph/(tph+hpt) and the tail otherwise, so 1-N
    * relations mostly corrupt heads and N-1 relations mostly corrupt
    * tails — minimizing the chance a corruption is accidentally true.
    *
    * Exactness trick: tph/(tph+hpt) = n_tails/(n_heads+n_tails), so the
    * Bernoulli draw is a PURE INTEGER comparison
    * `pHash % (h+t) < t` — no floating-point probability anywhere, and
    * the draw is reproducible AND oracle-checkable. Replacement ids use
    * the house corrupt-with-collision-bump rule (#12).
    *
    * Scale: relation stats are a relation-dictionary-sized broadcast;
    * the sample itself is map-only over the triple store.
    */
  def negSampleBernoulli(spark: SparkSession, dir: String): DataFrame = {
    val enc = Dict.encodedTriples(spark, dir)
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val rs = enc.groupBy("pid").agg(
      countDistinct("sid").as("rs_h"), countDistinct("oid").as("rs_t"))
    val headSide = PortableHash.pHash(
      concat_ws("|", lit("bside"), col("sid"), col("pid"), col("oid"))) %
      (col("rs_h") + col("rs_t")) < col("rs_t")
    val raw = PortableHash.pHash(
      concat_ws("|", lit("brep"), col("sid"), col("pid"), col("oid"))) % col("n_ent")
    enc.join(broadcast(rs), Seq("pid"))
      .crossJoin(broadcast(n))
      .withColumn("side", when(headSide, "head").otherwise("tail"))
      .withColumn("neg_sid",
        when(col("side") === "tail", col("sid"))
          .when(raw === col("sid"), (raw + 1) % col("n_ent"))
          .otherwise(raw))
      .withColumn("neg_oid",
        when(col("side") === "head", col("oid"))
          .when(raw === col("oid"), (raw + 1) % col("n_ent"))
          .otherwise(raw))
      .select("sid", "pid", "oid", "side", "neg_sid", "neg_oid")
  }

  val negSampleBernoulliSql: String = {
    val raw = s"${PortableHash.duck("'brep|' || sid || '|' || pid || '|' || oid")} % n_ent"
    val headSide =
      s"${PortableHash.duck("'bside|' || sid || '|' || pid || '|' || oid")} % (rs_h + rs_t) < rs_t"
    s"""${Dict.preludeCtes},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |rs AS (SELECT pid, COUNT(DISTINCT sid) AS rs_h,
       |              COUNT(DISTINCT oid) AS rs_t FROM encoded GROUP BY pid)
       |SELECT sid, pid, oid,
       |  CASE WHEN $headSide THEN 'head' ELSE 'tail' END AS side,
       |  CASE WHEN NOT ($headSide) THEN sid
       |       WHEN ($raw) = sid THEN (($raw) + 1) % n_ent
       |       ELSE ($raw) END AS neg_sid,
       |  CASE WHEN ($headSide) THEN oid
       |       WHEN ($raw) = oid THEN (($raw) + 1) % n_ent
       |       ELSE ($raw) END AS neg_oid
       |FROM encoded JOIN rs USING (pid), n""".stripMargin
  }

  // --------------------------------------------- type-constrained sampling

  /** #171: type-constrained corruption — the Spark-first analog of the
    * reference's CorruptedSampler over a type_index
    * (sample.py:69-90, 114-118): the replacement entity is drawn from the
    * RELATION'S OWN observed subject pool (slot 0) or object pool
    * (slot 1), not the global entity range, so every negative is
    * type-plausible by construction (a corrupted `placedBy` head is
    * always some order, never a region). Corrupted slot chosen per
    * triple by pHash parity (the reference draws the mode uniformly);
    * observed positives are rejected exactly as `tuple(nex) not in
    * self.xs` does — as with #40 this yields a rate, not a guarantee,
    * matching the reference's ntries-bounded retry.
    *
    * Scale: pools are (relation × distinct entity)-sized and need a
    * dense 0..sz-1 rank per (pid, slot) — assigned with the SAME
    * two-level bucket scheme the entity dictionary uses (Dict.encode):
    * rank within (pid, slot, ent % NBuckets) by a 640-way-parallel
    * window plus a broadcast cumulative-offset table (≤ 2·|relations|·
    * NBuckets rows), so no 2·|relations|-partition sort bottleneck.
    * (The pool ORDER is (bucket, ent) — any fixed bijection serves a
    * uniform sampler; the oracle mirrors it.) The pick is a shuffle
    * join keyed (pid, slot, rank); the positive-reject is one anti-join
    * on the triple key. Nothing broadcasts except the offset/size rows.
    */
  /** Ranked per-(relation, slot) pool cache: the pool index is the
    * sampler's reusable artifact (consumed by the size table AND the
    * pick join, and by every epoch's resample at training time) — at
    * 100 TB it is materialized once per corpus snapshot exactly like
    * the dictionaries.
    */
  private val poolCache = new graft.core.DfCache[(SparkSession, String)]

  def negSampleTyped(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val enc = Dict.encodedTriples(spark, dir)
    val pools = poolCache.getOrElseUpdate((spark, dir)) {
      val raw = enc.select(col("pid"), lit(0L).as("slot"), col("sid").as("ent")).distinct()
        .union(enc.select(col("pid"), lit(1L).as("slot"), col("oid").as("ent")).distinct())
        .withColumn("bucket", col("ent") % Dict.NBuckets)
      val local = raw.withColumn("local_rank", row_number().over(
        Window.partitionBy("pid", "slot", "bucket").orderBy("ent")))
      val offsets = raw.groupBy("pid", "slot", "bucket").agg(count(lit(1)).as("cnt"))
        .withColumn("offset", coalesce(
          sum("cnt").over(Window.partitionBy("pid", "slot").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("pid", "slot", "bucket", "offset")
      local.join(broadcast(offsets), Seq("pid", "slot", "bucket"))
        .select(col("pid"), col("slot"), col("ent"),
          (col("offset") + col("local_rank") - 1).as("rnk"))
        // r11 (guide §2.4; VERDICT r10 item 7): persist the pool
        // partitioned on the PICK join's key — the cached
        // InMemoryRelation then reports hashpartitioning(pid,slot,rnk)
        // and EnsureRequirements drops the pool-side Exchange from
        // every pick join (one per invocation here, one per epoch at
        // training scale). One extra exchange at build time, paid once
        // per session/corpus snapshot. Count matches the session's
        // shuffle-partition setting so the cands side co-partitions.
        .repartition(spark.sessionState.conf.numShufflePartitions,
          col("pid"), col("slot"), col("rnk"))
    }
    val sizes = pools.groupBy("pid", "slot").agg(count(lit(1)).as("sz"))
    val slotOf = PortableHash.pHash(
      concat_ws("|", lit("tmode"), col("sid"), col("pid"), col("oid"))) % 2
    val pick = PortableHash.pHash(
      concat_ws("|", lit("tpick"), col("sid"), col("pid"), col("oid"))) % col("sz")
    val cands = enc
      .withColumn("slot", slotOf)
      .join(broadcast(sizes), Seq("pid", "slot"))
      .withColumn("rnk", pick)
      .join(pools, Seq("pid", "slot", "rnk"))
      .withColumn("neg_sid", when(col("slot") === 0L, col("ent")).otherwise(col("sid")))
      .withColumn("neg_oid", when(col("slot") === 1L, col("ent")).otherwise(col("oid")))
      .select("sid", "pid", "oid", "slot", "neg_sid", "neg_oid")
    cands.join(
      enc.select(col("sid").as("neg_sid"), col("pid"), col("oid").as("neg_oid")),
      Seq("neg_sid", "pid", "neg_oid"), "left_anti")
      .select("sid", "pid", "oid", "slot", "neg_sid", "neg_oid")
  }

  val negSampleTypedSql: String = {
    val slotOf = s"${PortableHash.duck("'tmode|' || e.sid || '|' || e.pid || '|' || e.oid")} % 2"
    val pick = s"${PortableHash.duck("'tpick|' || e.sid || '|' || e.pid || '|' || e.oid")} % z.sz"
    s"""${Dict.preludeCtes},
       |pools AS MATERIALIZED (
       |  SELECT pid, 0 AS slot, ent,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY pid ORDER BY ent % ${Dict.NBuckets}, ent) - 1 AS rnk
       |  FROM (SELECT DISTINCT pid, sid AS ent FROM encoded)
       |  UNION ALL
       |  SELECT pid, 1, ent,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY pid ORDER BY ent % ${Dict.NBuckets}, ent) - 1
       |  FROM (SELECT DISTINCT pid, oid AS ent FROM encoded)
       |),
       |sizes AS (SELECT pid, slot, COUNT(*) AS sz FROM pools GROUP BY 1, 2),
       |cands AS (
       |  SELECT e.sid, e.pid, e.oid, z.slot,
       |    CASE WHEN z.slot = 0 THEN p.ent ELSE e.sid END AS neg_sid,
       |    CASE WHEN z.slot = 1 THEN p.ent ELSE e.oid END AS neg_oid
       |  FROM encoded e
       |  JOIN sizes z ON z.pid = e.pid AND z.slot = ($slotOf)
       |  JOIN pools p ON p.pid = e.pid AND p.slot = z.slot AND p.rnk = ($pick)
       |)
       |SELECT sid, pid, oid, CAST(slot AS BIGINT) AS slot, neg_sid, neg_oid
       |FROM cands c
       |WHERE NOT EXISTS (SELECT 1 FROM encoded e
       |                  WHERE e.sid = c.neg_sid AND e.pid = c.pid
       |                    AND e.oid = c.neg_oid)""".stripMargin
  }

  // ------------------------------- #227 self-adversarial neg weighting

  /** Negatives drawn per positive for the adversarial weighting. */
  val AdvK = 4
  /** Self-adversarial temperature α (dyadic — the α·Δ product stays a
    * single correctly-rounded op).
    */
  val AdvAlpha = 0.5

  /** #227: SELF-ADVERSARIAL negative weighting (Sun et al. 2019,
    * RotatE) — the sampler refinement that made uniform corruption
    * obsolete for modern KGE training: most uniform negatives are
    * trivially false and contribute vanishing gradient, so each of a
    * positive's K negatives is weighted by the MODEL'S OWN belief in
    * it, p_k = softmax_α(score_k) — hard negatives dominate the
    * gradient, easy ones fade. Composes the house pieces: the #12
    * deterministic hash corruption (K salted draws per positive), the
    * #13 TransE scorer over the dyadic embedding tables.
    *
    * Exactness: scores are exact (dyadic products, order-free plain
    * SUM in the oracle — the #13 argument); the softmax is stabilized
    * by the per-positive MAX (exact comparison of exact doubles), so
    * each exponent α·(s_k − max) is one subtraction and one dyadic
    * product, both correctly rounded; exp() outputs — the only
    * transcendental — quantize 1e-6 (the #203 ln discipline), making
    * the denominator an order-free scaled-integer sum and each weight
    * ONE division of engine-identical doubles. The max trick also
    * pins exp(0) = 1 exactly for the hardest negative.
    *
    * Plan: slice ×K map-side fan-out, the same bucketed entity join as
    * every scorer (neg-object embedding attach keyed on neg_oid), a
    * broadcast relation join, then two windows partitioned per
    * positive (K rows each). At 100 TB this is the training-time
    * shape: sampler and scorer share one shuffle keyed on entity id.
    */
  def negSampleAdversarial(spark: SparkSession, dir: String): DataFrame = {
    import graft.kge.Embeddings
    import graft.functions.VectorFolds
    import graft.core.Exact
    import org.apache.spark.sql.expressions.Window
    val e = Embeddings.entityEmb(spark, dir)
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val raw = PortableHash.pHash(concat_ws("|", lit("adv"),
      col("sid"), col("pid"), col("oid"), col("k"))) % col("n_ent")
    val negs = Embeddings.encodedSample(spark, dir, Embeddings.ScoreMod)
      .crossJoin(broadcast(n))
      .select(col("sid"), col("pid"), col("oid"), col("n_ent"),
        explode(sequence(lit(0L), lit(AdvK - 1L))).as("k"))
      .withColumn("neg_oid",
        when(raw === col("oid"), (raw + 1) % col("n_ent")).otherwise(raw))
    val scored = negs
      .join(e.select(col("id").as("sid"), col("v").as("h")), "sid")
      .join(broadcast(Embeddings.relationEmb(spark, dir)
        .select(col("id").as("pid"), col("v").as("r"))), "pid")
      .join(e.select(col("id").as("neg_oid"), col("v").as("t")), "neg_oid")
      .withColumn("score",
        -VectorFolds.transeSqSum(col("h"), col("r"), col("t")))
    val byPos = Window.partitionBy("sid", "pid", "oid")
    scored
      .withColumn("mx", max("score").over(byPos))
      .withColumn("term",
        Exact.roundS(exp(lit(AdvAlpha) * (col("score") - col("mx"))), 6))
      .withColumn("denom",
        sum(floor(col("term") * 1e6 + 0.5).cast("long")).over(byPos)
          .cast("double") / 1e6)
      .select(col("sid"), col("pid"), col("oid"), col("k"), col("neg_oid"),
        col("score"), (col("term") / col("denom")).as("weight"))
  }

  val negSampleAdversarialSql: String = {
    import graft.kge.Embeddings
    import graft.core.Exact
    val raw = s"${PortableHash.duck(
      "'adv|' || sid || '|' || pid || '|' || oid || '|' || k")} % n_ent"
    val he = Embeddings.duckEl("E", "sid", "i")
    val re = Embeddings.duckEl("R", "pid", "i")
    val tn = Embeddings.duckEl("E", "neg_oid", "i")
    s"""${Dict.preludeCtes},
       |${Dict.sampleEncodedCte(Embeddings.ScoreMod)},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |negs AS MATERIALIZED (
       |  SELECT sid, pid, oid, k,
       |    CASE WHEN ($raw) = oid THEN (($raw) + 1) % n_ent
       |         ELSE ($raw) END AS neg_oid
       |  FROM test_enc, (SELECT unnest(range(0, $AdvK)) AS k), n
       |),
       |scored AS MATERIALIZED (
       |  SELECT sid, pid, oid, k, neg_oid,
       |    -SUM((($he + $re) - $tn) * (($he + $re) - $tn)) AS score
       |  FROM negs, (SELECT unnest(range(0, ${Embeddings.D})) AS i)
       |  GROUP BY sid, pid, oid, k, neg_oid
       |),
       |terms AS (
       |  SELECT *, ${Exact.duckRoundS(
                s"exp($AdvAlpha * (score - mx))", 6)} AS term
       |  FROM (SELECT *,
       |          MAX(score) OVER (PARTITION BY sid, pid, oid) AS mx
       |        FROM scored)
       |)
       |SELECT sid, pid, oid, k, neg_oid, score,
       |  term / (CAST(SUM(CAST(floor(term * 1000000.0 + 0.5) AS BIGINT))
       |    OVER (PARTITION BY sid, pid, oid) AS DOUBLE) / 1000000.0)
       |    AS weight
       |FROM terms""".stripMargin
  }
}
