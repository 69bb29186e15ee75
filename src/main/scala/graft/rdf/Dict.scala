package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, TpchGraph}

/** Dictionary encoding: URI → dense integer ID, the entry point for all
  * KGE / tensor work.
  *
  * Reference semantics: distinct entities (subjects ∪ objects) and
  * relations each get a unique dense ID, and triples are mapped to
  * (sid, pid, oid) via joins
  * (reference: src/main/scala/net/sansa_stack/ml/kge/RDFDatasetReader.scala:28-71
  * `entityIDs`/`relationIDs`/`getMappedTriples`;
  * python/sansa/ml/kbc/rdfio.py:55-70). The reference uses
  * `zipWithUniqueId` (fast but partitioning-dependent); graft instead
  * assigns DETERMINISTIC ids so every downstream operator is
  * oracle-checkable and re-runs are reproducible.
  *
  * Scale design (100 TB): a naive `row_number() OVER (ORDER BY uri)` is a
  * single-partition window — a non-starter at 1e9 entities. graft's ids
  * are dense AND distributed:
  *
  *   bucket     = pHash(uri) % B            (deterministic, uniform)
  *   local_rank = row_number() over (partition by bucket order by uri)
  *   id         = offset(bucket) + local_rank - 1
  *
  * where offset is the cumulative bucket count (B rows — KBs — computed
  * with one tiny window and broadcast back). The per-bucket windows sort
  * B-way in parallel; no global sort, no single-partition stage. The id
  * assignment equals `row_number() OVER (ORDER BY bucket, uri) - 1`,
  * which is exactly what the DuckDB oracle computes.
  */
object Dict {

  /** Bucket count: parallelism of the dictionary sort. At 100 TB you'd
    * raise this to ~10× executor-cores; ids stay identical only for equal
    * B, so it's a fixed constant of the encoding, not a tuning knob.
    */
  val NBuckets = 64

  /** Per-(session, dir) dictionary cache. Every KGE/tensor operator
    * consumes the same dictionaries; rebuilding the
    * triples→distinct→window chain per query would multiply the dominant
    * cost of a session running several operators (exactly what Verify and
    * Bench do). `MEMORY_AND_DISK`: dictionaries are ~1e-3 of triple data,
    * and at 100 TB you'd materialize them once to parquet the same way.
    */
  private val cache = new graft.core.DfCache[(SparkSession, String, String)]("infra")

  private def cached(spark: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((spark, dir, key))(build)

  /** Encode a one-column ("uri") DataFrame of distinct values to
    * (uri, id) with dense deterministic ids 0..N-1.
    */
  def encode(uris: DataFrame): DataFrame = {
    val b = uris.withColumn("bucket", PortableHash.pHash(col("uri")) % NBuckets)
    val local = b.withColumn(
      "local_rank",
      row_number().over(Window.partitionBy("bucket").orderBy("uri")))
    // B rows: the only non-partitioned window in graft, bounded by NBuckets.
    val offsets = b.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(
        sum("cnt").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    local.join(broadcast(offsets), "bucket")
      .select(col("uri"),
        (col("offset") + col("local_rank") - 1).cast("long").as("id"))
  }

  /** Distinct entity URIs (subjects ∪ objects) of the TPC-H graph. */
  def entityUris(spark: SparkSession, dir: String): DataFrame = {
    val t = TpchGraph.triples(spark, dir)
    t.select(col("s").as("uri")).union(t.select(col("o").as("uri"))).distinct()
  }

  /** Entity dictionary: (uri, id). */
  def entities(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "entities") { encode(entityUris(spark, dir)) }

  /** Relation dictionary: (rel, rid). Relation vocabularies are tiny
    * (~1e3 even in large KGs), so a single-partition row_number is fine
    * here — documented exception to the bucket scheme.
    */
  def relations(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "relations") {
      TpchGraph.triples(spark, dir).select(col("p").as("rel")).distinct()
        .withColumn("rid", (row_number().over(Window.orderBy("rel")) - 1).cast("long"))
    }

  /** Triples mapped to ids: (sid, pid, oid).
    *
    * Join strategy (100 TB): the two entity-dictionary joins are
    * shuffle joins keyed on the uri (both sides big); the relation
    * dictionary is broadcast. Matches RDFDatasetReader.scala:60-71's
    * three-join shape, minus its RDD round-trips.
    */
  def encodedTriples(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "encoded") {
      // Explicit partition count before persist: AQE would coalesce the
      // small joined output to ~1 partition at test SFs, serializing
      // every downstream map-heavy consumer (MTTKRP's per-rank explode
      // was 60 s single-core vs ~4 s spread at sf0.1). Keyed by sid so
      // trainer/MTTKRP groupBys start from subject-co-located input.
      mapTriples(TpchGraph.triples(spark, dir), spark, dir)
        .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
          col("sid"))
    }

  /** Map an (s, p, o) triple DataFrame to ids using the FULL graph's
    * dictionaries (so sampled slices keep globally-consistent ids).
    */
  def mapTriples(t: DataFrame, spark: SparkSession, dir: String): DataFrame = {
    val e = entities(spark, dir)
    val r = relations(spark, dir)
    t.join(e.withColumnRenamed("uri", "s").withColumnRenamed("id", "sid"), "s")
      .join(e.withColumnRenamed("uri", "o").withColumnRenamed("id", "oid"), "o")
      .join(broadcast(r.withColumnRenamed("rel", "p")
        .withColumnRenamed("rid", "pid")), "p")
      .select("sid", "pid", "oid")
  }

  // ------------------------------------------- #292 persisted artifact

  /** Materialize the entity dictionary to a parquet artifact. This is
    * the "materialize once per corpus snapshot" path SURVEY §5 leans on
    * everywhere (session caches stand in for it at test scale): at
    * 100 TB the dictionary is computed ONCE per snapshot, persisted,
    * and every encode job LOADS it instead of re-deriving — write it
    * keyed by the join column so loads co-partition with the uri-keyed
    * encode joins.
    */
  def save(spark: SparkSession, dir: String, path: String): Unit =
    entities(spark, dir).repartition(col("uri"))
      .write.mode("overwrite").parquet(path)

  /** Load a persisted dictionary artifact. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("uri"), col("id"))

  /** #292: the save→load roundtrip as a registered query — the loaded
    * artifact must be VALUE-IDENTICAL to the session-derived dictionary
    * (the oracle recomputes it from the raw tables, so any loss or
    * drift through the parquet write/read fails the hash). Exercises
    * the one tier nothing else did: a derived artifact leaving the
    * session and coming back.
    */
  def persistRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // TempDirs-registered (shutdown-hook cleanup); the save stays inside
    // the call because save→load IS the operator under test.
    val out = graft.core.TempDirs.create("graft_dict_")
    save(spark, dir, out)
    load(spark, out)
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTE: entity dictionary with identical ids. */
  val entitiesCte: String =
    s"""entities AS MATERIALIZED (
       |  SELECT uri, CAST(ROW_NUMBER() OVER (
       |      ORDER BY ${PortableHash.duck("uri")} % ${NBuckets}, uri) - 1 AS BIGINT) AS id
       |  FROM (SELECT s AS uri FROM triples UNION SELECT o FROM triples)
       |)""".stripMargin

  /** DuckDB CTE: relation dictionary with identical ids. */
  val relationsCte: String =
    """relations AS MATERIALIZED (
      |  SELECT rel, CAST(ROW_NUMBER() OVER (ORDER BY rel) - 1 AS BIGINT) AS rid
      |  FROM (SELECT DISTINCT p AS rel FROM triples)
      |)""".stripMargin

  /** DuckDB CTE: encoded (sid, pid, oid) triples. */
  val encodedCte: String =
    """encoded AS MATERIALIZED (
      |  SELECT es.id AS sid, r.rid AS pid, eo.id AS oid
      |  FROM triples t
      |  JOIN entities es ON t.s = es.uri
      |  JOIN relations r ON t.p = r.rel
      |  JOIN entities eo ON t.o = eo.uri
      |)""".stripMargin

  /** Full prelude: triples + dictionaries + encoded. */
  val preludeCtes: String =
    s"WITH ${TpchGraph.cte},\n$entitiesCte,\n$relationsCte,\n$encodedCte"

  /** #8 oracle. */
  val entitiesSql: String =
    s"WITH ${TpchGraph.cte},\n$entitiesCte\nSELECT uri, id FROM entities"

  /** #9 oracle. */
  val relationsSql: String =
    s"WITH ${TpchGraph.cte},\n$relationsCte\nSELECT rel, rid FROM relations"

  /** #10 oracle. */
  val encodedSql: String =
    s"$preludeCtes\nSELECT sid, pid, oid FROM encoded"

  /** DuckDB CTE: encoded deterministic 1/mod sample of the triples
    * (sampled on the STRING triple so Spark and the oracle agree before
    * any id assignment).
    */
  def sampleEncodedCte(mod: Int, alias: String = "test_enc"): String =
    s"""$alias AS MATERIALIZED (
       |  SELECT es.id AS sid, r.rid AS pid, eo.id AS oid
       |  FROM triples t
       |  JOIN entities es ON t.s = es.uri
       |  JOIN relations r ON t.p = r.rel
       |  JOIN entities eo ON t.o = eo.uri
       |  WHERE ${PortableHash.duck("t.s || '|' || t.p || '|' || t.o")} % $mod = 0
       |)""".stripMargin

  // ---------------------------------------- #328 incremental dictionary

  /** #328: INCREMENTAL DICTIONARY UPDATE — the production maintenance
    * path the one-shot encode (#8) can't serve: when a new corpus
    * snapshot arrives, already-assigned entity ids MUST NOT move (every
    * persisted embedding table, encoded triple file, and downstream
    * artifact is keyed by them — #292's persisted tier exists precisely
    * so they survive); only genuinely new entities get ids, appended
    * AFTER the existing range in the same deterministic bucket order.
    * Re-encoding the world on every snapshot is the naive alternative
    * and is wrong twice at 100 TB: the re-encode cost itself, and the
    * invalidation of every id-keyed artifact. The registered run stages
    * the increment deterministically (the "old" snapshot = triples with
    * pHash('old|'|s|p|o) % 4 ≠ 0 — ¾ of the graph), derives the old
    * dictionary, and emits the UPDATED dictionary with an is_new flag.
    *
    * Scale: the old dictionary is a #292 parquet artifact — staged once
    * per (session, dir) by [[stagedOldDict]] and LOADED here, exactly
    * the production shape (the registered query therefore times the
    * operator: one artifact read + the delta encode — not the staging
    * derivation, which the oracle mirrors from the same ¾-split rule);
    * the new-entity set is one
    * uri-keyed anti-join; its ranking runs the same two-level bucket
    * scheme (64-way parallel local ranks + broadcast offsets — no
    * global sort) over ONLY the new entities; the offset is one
    * broadcast scalar. Append stability — old ids bit-identical through
    * the update — is the spec-pinned contract.
    */
  /** The staged "old snapshot" dictionary as a #292-style PERSISTED
    * artifact: derived and written ONCE per (session, dir), loaded
    * thereafter. This is exactly the production input to [[deltaUpdate]]
    * — the previous snapshot's dictionary is an artifact READ, never a
    * recompute (re-deriving it per call was the board's slowest bench
    * entry at 9 s warm; the operator itself is the anti-join + delta
    * encode). The derivation (¾ split on pHash('old|'|s|p|o)) is the
    * spec/oracle staging fixture, unchanged.
    */
  def stagedOldDict(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.core.TempDirs.stagedFor(
      (spark, dir, "olddict"), "graft_dict_old_") { out =>
      val t = TpchGraph.triples(spark, dir)
      val oldT = t.filter(PortableHash.pHash(concat(lit("old|"), col("s"),
        lit("|"), col("p"), lit("|"), col("o"))) % 4 =!= 0)
      val oldUris = oldT.select(col("s").as("uri"))
        .union(oldT.select(col("o").as("uri"))).distinct()
      encode(oldUris).repartition(col("uri"))
        .write.mode("overwrite").parquet(out)
    }
    load(spark, path)
  }

  def deltaUpdate(spark: SparkSession, dir: String): DataFrame = {
    val oldDict = stagedOldDict(spark, dir)
    val newUris = entityUris(spark, dir)
      .join(oldDict, Seq("uri"), "left_anti")
    val oldCnt = oldDict.agg(count(lit(1)).as("c"))
    val newDict = encode(newUris).crossJoin(broadcast(oldCnt))
      .select(col("uri"), (col("id") + col("c")).as("id"))
    oldDict.withColumn("is_new", lit(false))
      .unionByName(newDict.withColumn("is_new", lit(true)))
  }

  val deltaUpdateSql: String = {
    val oldH = PortableHash.duck("'old|' || s || '|' || p || '|' || o")
    def rank(src: String) =
      s"""SELECT uri, CAST(ROW_NUMBER() OVER (
         |    ORDER BY ${PortableHash.duck("uri")} % $NBuckets, uri) - 1
         |    AS BIGINT) AS id
         |  FROM $src""".stripMargin
    s"""WITH ${TpchGraph.cte},
       |old_t AS (SELECT * FROM triples WHERE $oldH % 4 <> 0),
       |old_e AS MATERIALIZED (
       |  ${rank("(SELECT s AS uri FROM old_t UNION SELECT o FROM old_t)")}
       |),
       |new_u AS (
       |  SELECT uri FROM (SELECT s AS uri FROM triples
       |    UNION SELECT o FROM triples)
       |  WHERE uri NOT IN (SELECT uri FROM old_e)
       |),
       |oc AS (SELECT COUNT(*) AS c FROM old_e),
       |new_e AS (SELECT uri, id + c AS id FROM (${rank("new_u")}), oc)
       |SELECT uri, id, FALSE AS is_new FROM old_e
       |UNION ALL
       |SELECT uri, id, TRUE AS is_new FROM new_e""".stripMargin
  }
}
