package graft.tensor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Dict

/** #179: mode-n unfolding (matricization) of the boolean COO tensor —
  * the index transform every unfolded-tensor algorithm starts from
  * (Kolda & Bader 2009 §2.4; the HaTen2 lineage the reference's README
  * cites computes its decompositions over exactly these unfoldings):
  * entry (i, j, k) of the I×J×K tensor lands at
  *
  *   mode 1 (subject): row i, col j + J·k
  *   mode 2 (object):  row j, col i + I·k
  *   mode 3 (relation): row k, col i + I·j
  *
  * The registered query emits the per-mode unfolding REPORT rather than
  * the (data-scale, purely re-indexed) matrix itself: occupied
  * rows/cols, nnz, the col-space extent actually touched, and a modular
  * index checksum Σ ((row mod P)·(col mod P)) that pins the full index
  * arithmetic of every entry — any off-by-one in any mode's formula
  * flips it. (P = 9973 keeps every term < 1e8, so the int64 sum is exact
  * to ~1e11 nnz; beyond that the checksum needs a wider modulus
  * discipline, noted here.)
  *
  * Scale: ONE pass over the COO triples computes all three modes via an
  * inline explode (3 rows per entry, map-side), then one aggregate onto
  * the 3-key mode space with map-side combine; the distinct row/col
  * counts plan through one Expand. Col indices use long arithmetic —
  * J·k stays exact far beyond any real dictionary (overflow only past
  * I·J ≈ 9e18).
  */
object Unfold {

  val ChkP = 9973L

  def unfoldStats(spark: SparkSession, dir: String): DataFrame = {
    // r10 (guide §2.3, shuffle fewer bytes): was explode(3 structs per
    // entry) + groupBy(mode) with two countDistincts — a 3·nnz generate
    // whose multi-distinct Expand fed 9·nnz map rows. One pass over the
    // COO rows with per-mode distinct aggregates plans a single 7·nnz
    // Expand, no generate; the three report rows unfold from the one
    // aggregate row. Values per mode are computed by the identical
    // formulas — same counts, extents and checksum.
    val nEnt = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val e = Dict.encodedTriples(spark, dir)
      .crossJoin(broadcast(nEnt))
      .select(col("sid"), col("pid"), col("oid"),
        (col("oid") + col("n_ent") * col("pid")).as("c1"),
        (col("sid") + col("n_ent") * col("pid")).as("c2"),
        (col("sid") + col("n_ent") * col("oid")).as("c3"))
    def modeAggs(m: Int, r: String, c: String) = Seq(
      countDistinct(col(r)).as(s"nr$m"),
      countDistinct(col(c)).as(s"nc$m"),
      min(col(c)).as(s"mn$m"),
      max(col(c)).as(s"mx$m"),
      sum((col(r) % ChkP) * (col(c) % ChkP)).as(s"ck$m"))
    val aggs = count(lit(1)).as("nnz") +:
      (modeAggs(1, "sid", "c1") ++ modeAggs(2, "oid", "c2") ++
        modeAggs(3, "pid", "c3"))
    def row(m: Int) = struct(lit(m.toLong).as("mode"), col("nnz"),
      col(s"nr$m").as("n_rows_occ"), col(s"nc$m").as("n_cols_occ"),
      col(s"mn$m").as("col_min"), col(s"mx$m").as("col_max"),
      col(s"ck$m").as("idx_checksum"))
    e.agg(aggs.head, aggs.tail: _*)
      .select(inline(array(row(1), row(2), row(3))))
  }

  val unfoldStatsSql: String =
    s"""${Dict.preludeCtes},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |modes AS (
       |  SELECT 1 AS mode, sid AS r, oid + n_ent * pid AS c FROM encoded, n
       |  UNION ALL
       |  SELECT 2, oid, sid + n_ent * pid FROM encoded, n
       |  UNION ALL
       |  SELECT 3, pid, sid + n_ent * oid FROM encoded, n
       |)
       |SELECT CAST(mode AS BIGINT) AS mode, COUNT(*) AS nnz,
       |  COUNT(DISTINCT r) AS n_rows_occ, COUNT(DISTINCT c) AS n_cols_occ,
       |  MIN(c) AS col_min, MAX(c) AS col_max,
       |  CAST(SUM((r % $ChkP) * (c % $ChkP)) AS BIGINT) AS idx_checksum
       |FROM modes GROUP BY mode""".stripMargin
}
