package graft.kge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CircularCorrelation.ccorr
import graft.functions.VectorFolds
import graft.rdf.Dict

/** KGE triple-scoring operators — TransE, DistMult, RESCAL, HolE — over a
  * deterministic test slice of the TPC-H graph.
  *
  * Reference semantics:
  *  - TransE: score = −‖h + r − t‖² (L2 similarity of h+r and t),
  *    src/main/scala/net/sansa_stack/ml/kge/model/TransE.scala:38-44.
  *  - DistMult / RESCAL bilinear: kge/hole.py:181-218 (`RescalModel`,
  *    score = hᵀ W_r t; DistMult is the diagonal special case).
  *  - HolE: score = rᵀ ccorr(h, t), python/sansa/ml/kbc/keras/holek.py:135-151.
  *
  * Plan shape (round 3): the slice JOINS the materialized id-keyed
  * embedding tables ([[Embeddings.entityEmb]] — built once per session,
  * O(N_entities·D) hash work) and the score is pure array math over
  * attribute columns inside one projection. Generating embeddings inline
  * in the score tree was measured 100× slower at sf0.1 (interpreted HOFs
  * re-evaluate the md5 generator per element — see the warning on
  * [[Embeddings.emb]]), and the join formulation is the learned-embedding
  * plan anyway: at 100 TB the entity table is bucketed by id and these
  * become co-located shuffle joins; the relation table always broadcasts.
  */
object Scoring {
  import Embeddings._

  private def sliced(spark: SparkSession, dir: String): DataFrame =
    encodedSample(spark, dir, ScoreMod)

  private val slicedEmbCache =
    new graft.core.DfCache[(SparkSession, String)]

  /** Slice ⋈ h ⋈ t ⋈ (broadcast) r — persisted per (session, dir): all
    * four scoring queries consume this identical join, so steady state
    * pays it once and each score is a pure codegen'd map over the
    * cached frame (the production shape too: one materialized
    * test-slice-with-embeddings table, many model scores over it).
    */
  private def slicedEmb(spark: SparkSession, dir: String): DataFrame =
    slicedEmbCache.getOrElseUpdate((spark, dir)) {
      val e = entityEmb(spark, dir)
      sliced(spark, dir)
        .join(e.select(col("id").as("sid"), col("v").as("h")), "sid")
        .join(e.select(col("id").as("oid"), col("v").as("t")), "oid")
        .join(broadcast(relationEmb(spark, dir)
          .select(col("id").as("pid"), col("v").as("r"))), "pid")
    }

  /** #13: TransE  score = −Σ_i (h_i + r_i − t_i)² (fused codegen fold). */
  def transeScore(spark: SparkSession, dir: String): DataFrame =
    slicedEmb(spark, dir)
      .withColumn("score",
        -VectorFolds.transeSqSum(col("h"), col("r"), col("t")))
      .select("sid", "pid", "oid", "score")

  /** #14: DistMult  score = Σ_i h_i · r_i · t_i (fused codegen fold). */
  def distmultScore(spark: SparkSession, dir: String): DataFrame =
    slicedEmb(spark, dir)
      .withColumn("score", VectorFolds.dot3(col("h"), col("r"), col("t")))
      .select("sid", "pid", "oid", "score")

  /** #15: RESCAL  score = hᵀ W_p t, W_p an 8×8 dyadic matrix per relation
    * (row-major flat index j = a·8 + b). W joins from the broadcast
    * [[Embeddings.rescalW]] table; h/t are the first 8 dims of the
    * entity table. The contraction is the native [[VectorFolds.bilinear]]
    * codegen loop — the same ascending flat-index IEEE sequence the
    * earlier flatten/array_repeat + zip_with formulation produced, with
    * no intermediate 64-element arrays per row.
    */
  def rescalScore(spark: SparkSession, dir: String): DataFrame = {
    val e = entityEmb(spark, dir)
    sliced(spark, dir)
      .join(e.select(col("id").as("sid"), slice(col("v"), 1, DRescal).as("h8")), "sid")
      .join(e.select(col("id").as("oid"), slice(col("v"), 1, DRescal).as("t8")), "oid")
      .join(broadcast(rescalW(spark, dir)
        .select(col("id").as("pid"), col("w"))), "pid")
      .withColumn("score",
        VectorFolds.bilinear(col("w"), col("h8"), col("t8")))
      .select("sid", "pid", "oid", "score")
  }

  /** #303: TuckER (Balažević et al. EMNLP'19)
    * score = W ×₁ e_h ×₂ w_r ×₃ e_t — the fully-shared-core bilinear
    * that SUBSUMES the whole family (RESCAL, DistMult, ComplEx, SimplE
    * are all rank-restricted special cases of the core): relations
    * share ONE d_e×d_r×d_e parameter tensor and differ only by their
    * d_r vector, which is what lets TuckER do multi-task learning
    * across relations that per-relation matrices (RESCAL) cannot.
    *
    * Plan — the real TuckER serving shape: the shared core collapses
    * against each relation ONCE on the dictionary-sized frame
    * (M_r = W ×₂ r, [[Embeddings.tuckerM]]), and every triple then pays
    * exactly RESCAL's codegen'd bilinear fold over the broadcast M
    * table. Exactness: every M entry is an exact dyadic sum
    * (denominator 2^14), every score term denominator 2^28 with all
    * magnitudes far inside 2^53 — the factored score equals the direct
    * 512-term contraction bit-for-bit, so the oracle is the plain
    * triple-SUM form and the factoring is machine-checked by the hash.
    */
  def tuckerScore(spark: SparkSession, dir: String): DataFrame = {
    val e = entityEmb(spark, dir)
    sliced(spark, dir)
      .join(e.select(col("id").as("sid"), slice(col("v"), 1, DRescal).as("h8")), "sid")
      .join(e.select(col("id").as("oid"), slice(col("v"), 1, DRescal).as("t8")), "oid")
      .join(broadcast(tuckerM(spark, dir)
        .select(col("id").as("pid"), col("m"))), "pid")
      .withColumn("score",
        VectorFolds.bilinear(col("m"), col("h8"), col("t8")))
      .select("sid", "pid", "oid", "score")
  }

  val tuckerScoreSql: String = {
    val de = DRescal
    val we = graft.core.PortableHash.duckDyadic(
      s"'TK|' || (a * ${de * de} + j * $de + b)")
    val he = duckEl("E", "sid", "a"); val te = duckEl("E", "oid", "b")
    val re = duckEl("R", "pid", "j")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid, SUM((($we * $re) * $he) * $te) AS score
       |FROM test_enc,
       |  (SELECT unnest(range(0, $de)) AS a),
       |  (SELECT unnest(range(0, $de)) AS j),
       |  (SELECT unnest(range(0, $de)) AS b)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  /** #16: HolE  score = Σ_k r_k · ccorr(h, t)_k via the custom Catalyst
    * [[graft.functions.CircularCorrelation]] expression (codegen'd O(d²)).
    */
  def holeScore(spark: SparkSession, dir: String): DataFrame =
    slicedEmb(spark, dir)
      .withColumn("cc", ccorr(col("h"), col("t")))
      .withColumn("score", VectorFolds.dotp(col("r"), col("cc")))
      .select("sid", "pid", "oid", "score")

  /** #61: embedding normalization — the reference's `normalize` (unit-L2
    * row projection, applied to entity embeddings between TransE epochs)
    * and `normless1` (divide by the SQUARED norm only when it exceeds 1 —
    * projection into the unit ball), python/sansa/ml/kbc/keras/param.py:108-121.
    * One row per (entity, dimension): the id-keyed embedding table shape,
    * exploded so the oracle compares scalars. Map-only over the table; at
    * 100 TB this is the between-epochs projection pass, co-partitioned
    * with the embedding table it rewrites.
    *
    * Exactness: dyadic squares sum exactly in any order; sqrt and the
    * divisions are single correctly-rounded IEEE ops.
    */
  def embedNormalize(spark: SparkSession, dir: String): DataFrame = {
    val vf = VectorFolds
    entityEmb(spark, dir)
      .withColumn("nsq", vf.sumSq(col("v")))
      .withColumn("norm", sqrt(col("nsq")))
      .select(col("id"), col("norm"), col("nsq"), posexplode(col("v")).as(Seq("i", "x")))
      .select(col("id"), col("i"), col("norm"),
        (col("x") / col("norm")).as("x_unit"),
        (col("x") / greatest(col("nsq"), lit(1.0))).as("x_ball"))
  }

  val embedNormalizeSql: String = {
    val el = duckEl("E", "id", "i")
    s"""${Dict.preludeCtes},
       |comps AS (
       |  SELECT id, i, $el AS x
       |  FROM entities, (SELECT unnest(range(0, ${D})) AS i)
       |), norms AS (
       |  SELECT id, sqrt(SUM(x * x)) AS norm, SUM(x * x) AS nsq
       |  FROM comps GROUP BY id
       |)
       |SELECT c.id, c.i, n.norm,
       |  c.x / n.norm AS x_unit,
       |  c.x / greatest(n.nsq, 1.0) AS x_ball
       |FROM comps c JOIN norms n USING (id)""".stripMargin
  }

  /** #73: ComplEx (Trouillon et al. ICML'16)
    * score = Re⟨h, r, t̄⟩ = Σ_i hr·rr·tr + hi·rr·ti + hr·ri·ti − hi·ri·tr
    * with complex d=16 embeddings (real parts = the E/R families,
    * imaginary parts = the EI/RI families). Completes the bilinear
    * model family: DistMult is ComplEx with zero imaginary parts, and
    * unlike DistMult the score is ASYMMETRIC in (h, t), so it can model
    * directed relations. Same plan as the other scores: slice ⋈ four
    * entity-part joins ⋈ two broadcast relation parts, then four fused
    * codegen folds in one projection. All terms are dyadic products —
    * exact in any summation order.
    */
  def complexScore(spark: SparkSession, dir: String): DataFrame = {
    val ce = complexEnt(spark, dir)
    sliced(spark, dir)
      .join(ce.select(col("id").as("sid"),
        col("vr").as("hr"), col("vi").as("hi")), "sid")
      .join(ce.select(col("id").as("oid"),
        col("vr").as("tr"), col("vi").as("ti")), "oid")
      .join(broadcast(complexRel(spark, dir).select(col("id").as("pid"),
        col("vr").as("rr"), col("vi").as("ri"))), "pid")
      .withColumn("score",
        VectorFolds.dot3(col("hr"), col("rr"), col("tr"))
          + VectorFolds.dot3(col("hi"), col("rr"), col("ti"))
          + VectorFolds.dot3(col("hr"), col("ri"), col("ti"))
          - VectorFolds.dot3(col("hi"), col("ri"), col("tr")))
      .select("sid", "pid", "oid", "score")
  }

  /** #194: RotatE (Sun et al. ICLR'19)  score = −Σ_i |h_i ∘ r_i − t_i|
    * with complex d=16 entities (the ComplEx families) and each relation
    * a UNIT-MODULUS complex rotation r_i = e^{jθ_i} — the model that
    * subsumes the family's symmetry menagerie (symmetric, antisymmetric,
    * inverse AND compositional relations, which neither TransE nor
    * ComplEx covers alone). The rotation derives from the dyadic
    * relation pair (a, b) by normalization c = a/√(a²+b²), s = b/√(a²+b²)
    * ((1, 0) when both are zero) — sqrt and division are single
    * correctly-rounded IEEE ops, so the coefficients are engine-identical
    * even though they are no longer dyadic; the per-dim residual modulus
    * is quantized to a scale-12 long INSIDE the fused codegen fold
    * ([[graft.functions.VectorFolds.rotateDistQ]]) so the reduction is
    * an order-independent integer sum, and the one division back to
    * score happens at the end.
    *
    * Plan: identical to the other scores — slice ⋈ two entity joins ⋈
    * one broadcast rotation table, one codegen'd projection. At 100 TB:
    * entity table bucketed by id, relation rotations always broadcast.
    */
  def rotateScore(spark: SparkSession, dir: String): DataFrame = {
    val ce = complexEnt(spark, dir)
    def unit(num: Column, a: Column, b: Column, zero: Double): Column = {
      val m = sqrt((a * a) + (b * b))
      when(m === 0.0, lit(zero)).otherwise(num / m)
    }
    val rot = complexRel(spark, dir).select(col("id").as("pid"),
      concat(
        zip_with(col("vr"), col("vi"), (a, b) => unit(a, a, b, 1.0)),
        zip_with(col("vr"), col("vi"), (a, b) => unit(b, a, b, 0.0))).as("cs"))
    sliced(spark, dir)
      .join(ce.select(col("id").as("sid"),
        col("vr").as("hr"), col("vi").as("hi")), "sid")
      .join(ce.select(col("id").as("oid"),
        col("vr").as("tr"), col("vi").as("ti")), "oid")
      .join(broadcast(rot), "pid")
      .withColumn("score",
        -(VectorFolds.rotateDistQ(col("hr"), col("hi"), col("tr"), col("ti"),
          col("cs")).cast("double") / lit(1e12)))
      .select("sid", "pid", "oid", "score")
  }

  /** #207: TransH score = −‖(h − (wᵀh)w) + r − (t − (wᵀt)w)‖² (Wang et
    * al. 2014) — the hyperplane-projection model completing the
    * translational family: TransE forces a relation to be ONE
    * translation (so 1-N/N-1 relations collapse their entity sets);
    * TransH projects entities onto a per-relation hyperplane first, so
    * one entity can sit at different effective positions under
    * different relations. The relation carries TWO vectors: the
    * translation r (the shared R family) and the unit normal
    * w = n/‖n‖ from a fresh dyadic family (WN) — ‖n‖² is an exact
    * dyadic sum, so the normalization is one sqrt + one division per
    * element, correctly-rounded and engine-identical (the RotatE
    * argument, vector-normalized instead of per-dimension).
    *
    * Exactness: w is non-dyadic, so BOTH the projections wᵀh, wᵀt and
    * the final distance would be fold-order-sensitive as raw double
    * sums; [[VectorFolds.transHDistQ]] accumulates all three as
    * scale-12 quantized integer sums inside ONE fused two-pass loop
    * (the codebase's first QuaternaryExpression) — order-free, so the
    * oracle uses plain SUMs. Plan: the shared cached test-slice join +
    * a broadcast dictionary-sized normal table; score is one codegen'd
    * projection.
    */
  def transhScore(spark: SparkSession, dir: String): DataFrame = {
    val wn = Dict.relations(spark, dir)
      .select(col("rid").as("pid"), emb("WN", col("rid")).as("n"))
      .select(col("pid"), col("n"),
        sqrt(VectorFolds.sumSq(col("n"))).as("m"))
      .select(col("pid"), transform(col("n"), x => x / col("m")).as("w"))
    slicedEmb(spark, dir)
      .join(broadcast(wn), "pid")
      .withColumn("score",
        -(VectorFolds.transHDistQ(col("h"), col("t"), col("r"), col("w"))
          .cast("double") / lit(1e12)))
      .select("sid", "pid", "oid", "score")
  }

  // ------------------------------------------ #297 score calibration

  /** #297: SCORE SEPARATION table for the TransE scorer — per integer
    * score bin, how many POSITIVE (observed) vs NEGATIVE (corrupted)
    * triples land there, and the positive rate: the reliability curve
    * a score-threshold consumer (link-prediction triage, KG cleaning)
    * reads before turning a raw score into a decision — the eval
    * family (#17/#18/#100) reports RANKS, which say nothing about
    * where an absolute cut is safe. Negatives corrupt the object with
    * the SAME hash rule as #12 (`neg\|s\|p\|o` mod N), so the pair set
    * is the one the loss queries already train against.
    *
    * Exactness: the TransE score is an exact dyadic sum (the #13
    * argument), so floor() bins identically in both engines; counts
    * are integers, the rate one division. Scale: two map-side scored
    * passes over the slice (positive and corrupted), one aggregate
    * onto the bounded integer-bin keyspace (score ∈ [−9D/4, 0] for
    * dyadic embeddings ⇒ ≤ ~40 bins at D=16).
    */
  def scoreCalibration(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.PortableHash
    val e = entityEmb(spark, dir)
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val raw = PortableHash.pHash(concat_ws("|",
      lit("neg"), col("sid"), col("pid"), col("oid"))) % col("n_ent")
    val j = sliced(spark, dir).crossJoin(broadcast(n))
      .withColumn("nid",
        when(raw === col("oid"), (raw + 1) % col("n_ent")).otherwise(raw))
      .join(e.select(col("id").as("sid"), col("v").as("h")), "sid")
      .join(e.select(col("id").as("oid"), col("v").as("t")), "oid")
      .join(e.select(col("id").as("nid"), col("v").as("tn")), "nid")
      .join(broadcast(relationEmb(spark, dir)
        .select(col("id").as("pid"), col("v").as("r"))), "pid")
    val rows = j.select(
        floor(-VectorFolds.transeSqSum(col("h"), col("r"), col("t")))
          .cast("long").as("score_bin"), lit(1L).as("pos"))
      .unionByName(j.select(
        floor(-VectorFolds.transeSqSum(col("h"), col("r"), col("tn")))
          .cast("long").as("score_bin"), lit(0L).as("pos")))
    rows.groupBy("score_bin")
      .agg(sum("pos").as("n_pos"),
        sum(lit(1L) - col("pos")).as("n_neg"),
        count(lit(1)).as("n_total"))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n_total"))
  }

  val scoreCalibrationSql: String = {
    import graft.core.PortableHash
    val negHash = PortableHash.duck("'neg|' || sid || '|' || pid || '|' || oid")
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "i")
    val te = duckEl("E", "oid", "i"); val ne = duckEl("E", "nid", "i")
    s"""${Dict.preludeCtes},
       |${Dict.sampleEncodedCte(ScoreMod)},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |mbc AS MATERIALIZED (
       |  SELECT sid, pid, oid,
       |    CASE WHEN ($negHash % n_ent) = oid
       |         THEN (($negHash % n_ent) + 1) % n_ent
       |         ELSE $negHash % n_ent END AS nid
       |  FROM test_enc, n
       |),
       |sp AS (
       |  SELECT sid, pid, oid, nid,
       |    -SUM((($he + $re) - $te) * (($he + $re) - $te)) AS spos,
       |    -SUM((($he + $re) - $ne) * (($he + $re) - $ne)) AS sneg
       |  FROM mbc, (SELECT unnest(range(0, ${D})) AS i)
       |  GROUP BY 1, 2, 3, 4
       |),
       |u AS (
       |  SELECT CAST(floor(spos) AS BIGINT) AS score_bin, 1 AS pos FROM sp
       |  UNION ALL
       |  SELECT CAST(floor(sneg) AS BIGINT), 0 FROM sp
       |)
       |SELECT score_bin,
       |  CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
       |  COUNT(*) AS n_total,
       |  CAST(SUM(pos) AS DOUBLE) / COUNT(*) AS pos_rate
       |FROM u GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- oracle

  private def prelude(mod: Int): String =
    s"${Dict.preludeCtes},\n${Dict.sampleEncodedCte(mod)}"

  val transeScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "i")
    val te = duckEl("E", "oid", "i")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid,
       |  -SUM((($he + $re) - $te) * (($he + $re) - $te)) AS score
       |FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val distmultScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "i")
    val te = duckEl("E", "oid", "i")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid, SUM(($he * $re) * $te) AS score
       |FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val rescalScoreSql: String = {
    val we = duckEl("W", "pid", "(a * " + DRescal + " + b)")
    val he = duckEl("E", "sid", "a"); val te = duckEl("E", "oid", "b")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid, SUM(($we * $he) * $te) AS score
       |FROM test_enc,
       |  (SELECT unnest(range(0, ${DRescal})) AS a),
       |  (SELECT unnest(range(0, ${DRescal})) AS b)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val holeScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "k")
    val te = duckEl("E", "oid", s"((i + k) % ${D})")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid, SUM($re * ($he * $te)) AS score
       |FROM test_enc,
       |  (SELECT unnest(range(0, ${D})) AS k),
       |  (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val rotateScoreSql: String = {
    val hr = duckEl("E", "sid", "i"); val hi = duckEl("EI", "sid", "i")
    val tr = duckEl("E", "oid", "i"); val ti = duckEl("EI", "oid", "i")
    val a = duckEl("R", "pid", "i"); val b = duckEl("RI", "pid", "i")
    s"""${prelude(ScoreMod)},
       |terms AS (
       |  SELECT sid, pid, oid, i,
       |    $hr AS hr, $hi AS hi, $tr AS tr, $ti AS ti,
       |    $a AS a, $b AS b
       |  FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |), rot AS (
       |  SELECT sid, pid, oid, hr, hi, tr, ti,
       |    CASE WHEN sqrt((a * a) + (b * b)) = 0 THEN 1.0
       |      ELSE a / sqrt((a * a) + (b * b)) END AS c,
       |    CASE WHEN sqrt((a * a) + (b * b)) = 0 THEN 0.0
       |      ELSE b / sqrt((a * a) + (b * b)) END AS s
       |  FROM terms
       |), res AS (
       |  SELECT sid, pid, oid,
       |    ((hr * c) - (hi * s)) - tr AS re,
       |    ((hr * s) + (hi * c)) - ti AS im
       |  FROM rot
       |)
       |SELECT sid, pid, oid,
       |  -(CAST(SUM(CAST(floor(sqrt((re * re) + (im * im)) * 1000000000000.0
       |      + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000.0) AS score
       |FROM res GROUP BY sid, pid, oid""".stripMargin
  }

  val complexScoreSql: String = {
    val hr = duckEl("E", "sid", "i"); val hi = duckEl("EI", "sid", "i")
    val tr = duckEl("E", "oid", "i"); val ti = duckEl("EI", "oid", "i")
    val rr = duckEl("R", "pid", "i"); val ri = duckEl("RI", "pid", "i")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid,
       |  SUM((($hr * $rr) * $tr) + (($hi * $rr) * $ti)
       |    + (($hr * $ri) * $ti) - (($hi * $ri) * $tr)) AS score
       |FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val transhScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val te = duckEl("E", "oid", "i")
    val re = duckEl("R", "pid", "i"); val nw = duckEl("WN", "pid", "i")
    val nn = duckEl("WN", "rid", "i")
    s"""${prelude(ScoreMod)},
       |terms AS (
       |  SELECT sid, pid, oid, i,
       |    $he AS he, $te AS te, $re AS re, $nw AS nw
       |  FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |), wnorm AS (
       |  SELECT rid AS pid, sqrt(SUM($nn * $nn)) AS m
       |  FROM relations, (SELECT unnest(range(0, ${D})) AS i)
       |  GROUP BY rid
       |), tw AS (
       |  SELECT t.*, (t.nw / w.m) AS wi FROM terms t JOIN wnorm w USING (pid)
       |), ab AS (
       |  SELECT sid, pid, oid,
       |    CAST(SUM(CAST(floor((wi * he) * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS aq,
       |    CAST(SUM(CAST(floor((wi * te) * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS bq
       |  FROM tw GROUP BY sid, pid, oid
       |), res AS (
       |  SELECT tw.sid, tw.pid, tw.oid,
       |    ((he - ((CAST(aq AS DOUBLE) / 1000000000000.0) * wi)) + re)
       |      - (te - ((CAST(bq AS DOUBLE) / 1000000000000.0) * wi)) AS u
       |  FROM tw JOIN ab ON tw.sid = ab.sid AND tw.pid = ab.pid
       |    AND tw.oid = ab.oid
       |)
       |SELECT sid, pid, oid,
       |  -(CAST(CAST(SUM(CAST(floor((u * u) * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |    / 1000000000000.0) AS score
       |FROM res GROUP BY sid, pid, oid""".stripMargin
  }

  /** #252: PairRE score = −‖h∘rᴴ − t∘rᵀ‖² (Chao et al. 2021) — the
    * modern translational variant the family lacked: TransE translates,
    * TransH/TransR project, RotatE rotates; PairRE SCALES each side
    * with its own relation vector (paired elementwise products), which
    * is what lets one relation encode 1-N/N-1 fan-out by shrinking the
    * many-side's norm — the reason it took the OGB leaderboards. Two
    * fresh dyadic relation families (RH, RT).
    *
    * Exactness — the #235 bit-budget argument, one step shorter:
    * h_i·rᴴ_i is a product of two 7-bit dyadics (≤14 bits on the
    * 1/16384 grid), the difference stays on-grid (≤15 bits), its
    * square ≤30, and the 16-term sum ≤34 — everything exact, plain-SUM
    * oracle, no quantization.
    *
    * Plan: the family's shared cached slice join + ONE broadcast of
    * the dictionary-sized paired-relation table; the score is a single
    * fused array projection.
    */
  def pairreScore(spark: SparkSession, dir: String): DataFrame = {
    val rel = tablePairre(spark, dir)
    slicedEmb(spark, dir)
      .join(broadcast(rel), "pid")
      .withColumn("score", -Embeddings.dFold(
        transform(sequence(lit(0), lit(D - 1)), i => {
          val u = element_at(col("h"), i + 1) * element_at(col("rh"), i + 1) -
            element_at(col("t"), i + 1) * element_at(col("rt"), i + 1)
          u * u
        })))
      .select("sid", "pid", "oid", "score")
  }

  private def tablePairre(spark: SparkSession, dir: String): DataFrame =
    Dict.relations(spark, dir).select(col("rid").as("pid"),
      Embeddings.emb("RH", col("rid")).as("rh"),
      Embeddings.emb("RT", col("rid")).as("rt"))

  val pairreScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val te = duckEl("E", "oid", "i")
    val rh = duckEl("RH", "pid", "i"); val rt = duckEl("RT", "pid", "i")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid,
       |  -SUM((($he * $rh) - ($te * $rt)) * (($he * $rh) - ($te * $rt)))
       |    AS score
       |FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  /** #235: TransR score = −‖M_r h + r − M_r t‖² (Lin et al. 2015) —
    * the third translational rung: TransE forces ONE space, TransH a
    * per-relation hyperplane inside it, TransR a full per-relation
    * SPACE — a k×d projection matrix M_r maps entities (d = 16) into
    * an 8-dim relation space before translating, so a relation can
    * weigh entity dimensions arbitrarily, not just mask one normal
    * direction.
    *
    * Exactness — the nice case of the family: dyadic entries are
    * k/128 with |k| ≤ 100 (7 significant bits), so every projection
    * component Σ_j M_ij·e_j is a sum of 16 exact 1/16384-grid products
    * (≤ 18 bits), the residual stays on the grid, its square needs
    * ≤ 38 bits and the 8-term score sum ≤ 41 — EVERYTHING below 2^53,
    * so unlike TransH no quantized fold is needed: the oracle is plain
    * SUMs and the result bit-exact in any evaluation order.
    *
    * Plan: the family's shared cached slice join (h, r, t already
    * attached) + ONE broadcast join of the dictionary-sized projection
    * table; both projections and the distance are array math inside a
    * single projection over materialized columns (the [[Embeddings
    * .emb]] HOF warning honored — no generator in the lambda).
    */
  def transrScore(spark: SparkSession, dir: String): DataFrame = {
    import Embeddings.DTransR
    slicedEmb(spark, dir)
      .join(broadcast(Embeddings.transrM(spark, dir)
        .select(col("id").as("pid"), col("m"))), "pid")
      .withColumn("score", -Embeddings.dFold(
        transform(sequence(lit(0), lit(DTransR - 1)), i => {
          def proj(e: Column) =
            aggregate(sequence(lit(0), lit(D - 1)), lit(0.0),
              (a, j) => a +
                element_at(col("m"), i * D + j + 1) * element_at(e, j + 1))
          val u = proj(col("h")) + element_at(col("r"), i + 1) -
            proj(col("t"))
          u * u
        })))
      .select("sid", "pid", "oid", "score")
  }

  val transrScoreSql: String = {
    val me = duckEl("MR", "pid", s"(i * ${D} + j)")
    val he = duckEl("E", "sid", "j"); val te = duckEl("E", "oid", "j")
    val re = duckEl("R", "pid", "i")
    s"""${prelude(ScoreMod)},
       |proj AS (
       |  SELECT sid, pid, oid, i,
       |    SUM($me * $he) AS hp, SUM($me * $te) AS tp
       |  FROM test_enc,
       |    (SELECT unnest(range(0, ${Embeddings.DTransR})) AS i),
       |    (SELECT unnest(range(0, ${D})) AS j)
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT sid, pid, oid,
       |  -SUM(((hp + $re) - tp) * ((hp + $re) - tp)) AS score
       |FROM proj GROUP BY sid, pid, oid""".stripMargin
  }

  /** #264: SimplE score = ½(⟨hᵉ_s, r_p, tᵉ_o⟩ + ⟨hᵉ_o, r⁻¹_p, tᵉ_s⟩)
    * (Kazemi & Poole, NeurIPS 2018) — the FULLY-EXPRESSIVE bilinear the
    * family lacked: DistMult (#14) is forced symmetric (score(s,p,o) =
    * score(o,p,s) always — it cannot represent `placedBy` having a
    * direction); SimplE fixes that with the canonical-polyadic trick of
    * giving every entity a HEAD-role and a TAIL-role vector and every
    * relation an inverse, averaging the forward and inverse-direction
    * products. Two fresh dyadic families (ET, RV); the head-role and
    * forward-relation families are the shared E/R.
    *
    * Exactness: each term is a triple product of 7-bit dyadics —
    * on the 1/2²¹ grid with ≤20-bit numerators, a 16-term sum ≤25 bits,
    * the two-sum total ≤26 and the half is a dyadic halving — ALL exact,
    * plain-SUM oracle, no quantization anywhere.
    *
    * Plan: two entity-table joins (one per side, both roles ride ONE
    * frame — the [[Embeddings.complexEnt]] trick) + ONE broadcast of the
    * paired-relation table; both folds are fused codegen loops.
    */
  def simpleScore(spark: SparkSession, dir: String): DataFrame = {
    val e = simpleEnt(spark, dir)
    sliced(spark, dir)
      .join(e.select(col("id").as("sid"),
        col("he").as("hs"), col("te").as("ts2")), "sid")
      .join(e.select(col("id").as("oid"),
        col("he").as("ho"), col("te").as("to2")), "oid")
      .join(broadcast(simpleRel(spark, dir)
        .select(col("id").as("pid"), col("r"), col("rv"))), "pid")
      .withColumn("score",
        (VectorFolds.dot3(col("hs"), col("r"), col("to2"))
          + VectorFolds.dot3(col("ho"), col("rv"), col("ts2"))) / 2.0)
      .select("sid", "pid", "oid", "score")
  }

  val simpleScoreSql: String = {
    val hs = duckEl("E", "sid", "i"); val ho = duckEl("E", "oid", "i")
    val ts = duckEl("ET", "sid", "i"); val to = duckEl("ET", "oid", "i")
    val re = duckEl("R", "pid", "i"); val rv = duckEl("RV", "pid", "i")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid,
       |  (SUM(($hs * $re) * $to) + SUM(($ho * $rv) * $ts)) / 2.0 AS score
       |FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  /** #265: QuatE score = Σ_u ⟨h_u ⊗ ŵ_u, t_u⟩ (Zhang et al., NeurIPS
    * 2019) — the hypercomplex rung above RotatE: entities and relations
    * are QUATERNIONS (D = 16 → 4 units of (a,b,c,d)); the relation is
    * normalized to unit norm per unit and applied by the HAMILTON
    * product, a genuine 4-D rotation with two planes of freedom where
    * RotatE's complex product has one — which is what lets QuatE model
    * composition AND inversion with one representation. Fresh dyadic
    * family QR for the raw relation quaternions.
    *
    * Exactness — the TransH/RotatE normalization argument: the unit
    * norm is √(a²+b²+c²+d²) of exact dyadics (exact sum, one
    * correctly-rounded sqrt), each normalized component ONE division —
    * both engines hold bit-identical ŵ. The Hamilton components and
    * the final dot are then a FIXED LITERAL IEEE TREE (all index
    * ranges unrolled at plan time — no data-dependent fold order
    * anywhere), so the score is bit-identical with NO quantized fold:
    * the oracle is the same expression text over the same scalars.
    *
    * Plan: the family's shared cached slice join + ONE broadcast of the
    * dictionary-sized quaternion table; the whole score is one codegen
    * projection (element_at over materialized arrays — the
    * [[Embeddings.emb]] HOF warning honored).
    */
  def quateScore(spark: SparkSession, dir: String): DataFrame =
    slicedEmb(spark, dir)
      .join(broadcast(quateRel(spark, dir)
        .select(col("id").as("pid"), col("q"))), "pid")
      .withColumn("score", quateExpr(col("h"), col("q"), col("t")))
      .select("sid", "pid", "oid", "score")

  /** The unrolled per-unit Hamilton-product score tree (shared shape
    * with [[quateScoreSql]] — both sides parse to the same IEEE tree).
    */
  private def quateExpr(h: Column, q: Column, t: Column): Column = {
    val units = (0 until D / 4).map { u =>
      val b = 4 * u
      def el(c: Column, k: Int) = element_at(c, b + k + 1)
      val (qa, qb, qc, qd) = (el(q, 0), el(q, 1), el(q, 2), el(q, 3))
      val nrm = sqrt(qa * qa + qb * qb + qc * qc + qd * qd)
      val (wa, wb, wc, wd) = (qa / nrm, qb / nrm, qc / nrm, qd / nrm)
      val (ha, hb, hc, hd) = (el(h, 0), el(h, 1), el(h, 2), el(h, 3))
      val (ta, tb, tc, td) = (el(t, 0), el(t, 1), el(t, 2), el(t, 3))
      val pa = ha * wa - hb * wb - hc * wc - hd * wd
      val pb = ha * wb + hb * wa + hc * wd - hd * wc
      val pc = ha * wc - hb * wd + hc * wa + hd * wb
      val pd = ha * wd + hb * wc - hc * wb + hd * wa
      pa * ta + pb * tb + pc * tc + pd * td
    }
    units.reduce(_ + _)
  }

  val quateScoreSql: String = {
    def unit(u: Int): String = {
      val b = 4 * u
      def he(k: Int) = duckEl("E", "sid", s"${b + k}")
      def te(k: Int) = duckEl("E", "oid", s"${b + k}")
      def qe(k: Int) = duckEl("QR", "pid", s"${b + k}")
      val nrm = s"sqrt(${qe(0)} * ${qe(0)} + ${qe(1)} * ${qe(1)}" +
        s" + ${qe(2)} * ${qe(2)} + ${qe(3)} * ${qe(3)})"
      def w(k: Int) = s"(${qe(k)} / $nrm)"
      val pa = s"(${he(0)} * ${w(0)} - ${he(1)} * ${w(1)}" +
        s" - ${he(2)} * ${w(2)} - ${he(3)} * ${w(3)})"
      val pb = s"(${he(0)} * ${w(1)} + ${he(1)} * ${w(0)}" +
        s" + ${he(2)} * ${w(3)} - ${he(3)} * ${w(2)})"
      val pc = s"(${he(0)} * ${w(2)} - ${he(1)} * ${w(3)}" +
        s" + ${he(2)} * ${w(0)} + ${he(3)} * ${w(1)})"
      val pd = s"(${he(0)} * ${w(3)} + ${he(1)} * ${w(2)}" +
        s" - ${he(2)} * ${w(1)} + ${he(3)} * ${w(0)})"
      s"($pa * ${te(0)} + $pb * ${te(1)} + $pc * ${te(2)} + $pd * ${te(3)})"
    }
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid,
       |  ${(0 until D / 4).map(unit).mkString("\n  + ")} AS score
       |FROM test_enc""".stripMargin
  }
}
