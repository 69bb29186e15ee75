package graft.ann

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #337 persisted ANN serving index: the loaded artifact must serve the
  * EXACT top-k the session-built index serves (bit-identical doubles),
  * the on-disk layout must be the cell-partitioned inverted-list shape
  * the 100 TB story depends on, the serve plan must actually prune to
  * the probed cells, and — negative control — a damaged artifact must
  * change the answer (so the bit-identity assertion has teeth).
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rm(root: Path): Unit =
    if (Files.exists(root))
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))

  test("served-from-loaded artifact is bit-identical to the session-built index") {
    val session = Ann.ivfpqTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val served = AnnIndex.roundtrip(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(session.nonEmpty)
    assert(served.length == session.length)
    served.zip(session).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2 && a._4 == b._4)
      // bit-identity, not tolerance: the artifact roundtrip and the
      // literal-codebook session path must run the same IEEE sequence
      assert(java.lang.Double.doubleToRawLongBits(a._3) ==
        java.lang.Double.doubleToRawLongBits(b._3))
    }
  }

  test("artifact layout: codes are cell-partitioned; codebooks present") {
    val dir = Files.createTempDirectory("graft_annindex_spec_").toString
    try {
      AnnIndex.save(spark, TestSpark.sf, dir)
      val cellDirs = Files.list(Paths.get(s"$dir/codes.parquet")).iterator()
      val cells = Iterator.continually(cellDirs)
        .takeWhile(_.hasNext).map(_.next().getFileName.toString)
        .filter(_.startsWith("cell=")).toSeq
      assert(cells.nonEmpty, "codes.parquet must be partitioned by cell")
      val (codes, cents, flat) = AnnIndex.load(spark, dir)
      assert(codes.columns.toSet == Set("vec_id", "codes", "cell"))
      assert(cents.length == Ann.NCells)
      assert(flat.length == Ann.pqFlatCodebook.length)
      // codebooks round-trip bit-exactly (doubles through parquet)
      assert(flat.zip(Ann.pqFlatCodebook).forall { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b) })
    } finally rm(Paths.get(dir))
  }

  test("serve plan prunes the codes scan to the probed cells") {
    val plan = AnnIndex.roundtrip(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the IN-filter on the partition column must land as a partition
    // filter on the CODES scan, not a post-scan Filter: find the scan
    // line over codes.parquet and check ITS PartitionFilters clause
    val codesScan = plan.linesIterator
      .find(l => l.contains("codes.parquet") && l.contains("PartitionFilters"))
    assert(codesScan.isDefined, s"no codes.parquet scan in:\n$plan")
    assert(codesScan.get.split("PartitionFilters: \\[", 2)(1)
      .takeWhile(_ != ']').contains("cell"),
      s"expected a cell partition filter on: ${codesScan.get}")
  }

  test("delta ingest: base + appended arrivals serve bit-identically to the full index") {
    val session = Ann.ivfpqTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val delta = AnnIndex.deltaRoundtrip(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(delta.length == session.length && delta.nonEmpty)
    delta.zip(session).foreach { case (a, b) =>
      assert(a == b, s"delta-ingested index diverges: $a != $b")
    }
  }

  test("delta ingest is O(|delta|): the append adds exactly the arrival slice; base-only serving misses it") {
    val dir = Files.createTempDirectory("graft_anndelta_spec_").toString
    try {
      import org.apache.spark.sql.functions.col
      val isNew = col("vec_id") % AnnIndex.DeltaMod === AnnIndex.DeltaRes
      AnnIndex.save(spark, TestSpark.sf, dir, !isNew)
      val baseOnly = AnnIndex.servedTopK(spark, TestSpark.sf, dir)
        .as[(Long, Long, Double, Int)].collect().toSet
      val nBase = spark.read.parquet(s"$dir/codes.parquet").count()
      AnnIndex.appendDelta(spark, TestSpark.sf, dir, isNew)
      val nAll = spark.read.parquet(s"$dir/codes.parquet").count()
      val emb = graft.core.Tables.embeddings(spark, TestSpark.sf)
      assert(nAll - nBase == emb.filter(isNew).count(),
        "the append must add exactly the arrival slice, nothing else")
      assert(nAll == emb.count())
      val merged = AnnIndex.servedTopK(spark, TestSpark.sf, dir)
        .as[(Long, Long, Double, Int)].collect().toSet
      // negative control: without the delta, some neighbors are missing
      assert(baseOnly != merged,
        "base-only serving must visibly miss the arrivals")
      // and no duplicate (q_id, vec_id) pairs after the append
      val keys = merged.toSeq.map(r => (r._1, r._2))
      assert(keys.length == keys.distinct.length)
    } finally rm(Paths.get(dir))
  }

  test("negative control: a lost inverted list changes the served answer") {
    val dir = Files.createTempDirectory("graft_annindex_neg_").toString
    try {
      AnnIndex.save(spark, TestSpark.sf, dir)
      val intact = AnnIndex.servedTopK(spark, TestSpark.sf, dir)
        .as[(Long, Long, Double, Int)].collect().toSet
      // find a cell that actually contributed a result row and delete it
      val (_, cents, flat) = AnnIndex.load(spark, dir)
      val hitIds = intact.map(_._2)
      val cellsHit = spark.read.parquet(s"$dir/codes.parquet")
        .filter(org.apache.spark.sql.functions.col("vec_id")
          .isin(hitIds.toSeq.map(Long.box): _*))
        .select("cell").distinct().as[Int].collect()
      assert(cellsHit.nonEmpty)
      rm(Paths.get(s"$dir/codes.parquet/cell=${cellsHit.min}"))
      val damaged = AnnIndex.servedTopK(spark, TestSpark.sf, dir)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(damaged != intact,
        "deleting a contributing inverted list must change the top-k")
    } finally rm(Paths.get(dir))
  }
}
