package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger SF from an existing one by key-shifted
  * replication (replica r adds r·OFF to every key column), for scaling
  * smoke runs past the generated test data — e.g. an sf1 from sf0.1.
  * Dimension tables (nation, region) copy 1×; fact/event/doc tables
  * replicate with disjoint key spaces, so join fan-outs, group
  * cardinalities, and graph entity counts all scale ~linearly like a
  * real larger SF (text/embedding payloads repeat, which only matters
  * to content-dedup rates, not to plan shapes).
  *
  * Usage: sbt "runMain graft.tools.ScaleUp [srcDir] [dstDir] [reps]"
  */
object ScaleUp {

  private val Off = 10000000L

  private val shifts: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "nation" -> Seq.empty,
    "region" -> Seq.empty,
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }

    for ((t, cols) <- shifts) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out =
        if (cols.isEmpty) df
        else df
          .withColumn("_r", explode(array((0 until reps).map(r => lit(r.toLong)): _*)))
          .select(df.columns.map(c =>
            if (cols.contains(c)) (col(c) + col("_r") * Off).as(c)
            else col(c)): _*)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: ${df.count()} -> ${spark.read.parquet(s"$dst/$t.parquet").count()}")
    }
    spark.stop()
  }
}
