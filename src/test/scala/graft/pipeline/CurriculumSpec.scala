package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark

class CurriculumSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("curriculum order: total, unique steps, quality-descending per " +
    "shard, round-robin interleave") {
    val r = Curriculum.curriculum(spark, TestSpark.sf).cache()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(r.count() == nDocs)
    assert(r.select("doc_id").distinct().count() == nDocs)
    // the schedule is a valid total order: global steps are unique and
    // encode (pos, shard) round-robin
    assert(r.select("global_step").distinct().count() == nDocs)
    assert(r.filter(pmod(col("global_step"), lit(Curriculum.NShards))
      =!= col("shard")).isEmpty)
    // positions are contiguous 1..n_shard within every shard
    val perShard = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"),
        countDistinct("pos").as("nd"))
    assert(perShard.filter(col("mn") =!= 1 || col("mx") =!= col("n") ||
      col("nd") =!= col("n")).isEmpty)
    // curriculum property: quality never increases along a shard's order
    val w = Window.partitionBy("shard").orderBy("pos")
    assert(r.withColumn("prev_qi", lag("qi", 1).over(w))
      .filter(col("prev_qi").isNotNull && col("qi") > col("prev_qi")).isEmpty)
    // the shard hash actually spreads the corpus
    assert(r.select("shard").distinct().count() == Curriculum.NShards)
    r.unpersist()
  }
}
