package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: focused per-query timing with the Bench protocol (untimed
  * warmup, GC boundary, two timed noop-writes, min reported) without
  * paying for the whole headline set.
  *
  * Usage: sbt "runMain graft.tools.QueryTime <sfDir> <query> [query...]"
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    graft.core.Caches.enableCheckpointSweep() // cold probe rebuilds per leg
    def once(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime - t0) / 1e9
    }
    names.foreach(once) // warmup pass (populates session caches)
    names.foreach { n =>
      val warm = (1 to 2).map(_ => once(n)).min
      graft.core.Caches.clearDerived(); System.gc()
      val cold = once(n)
      println(f"[qtime] $n%-28s warm $warm%7.2f s   cold $cold%7.2f s")
    }
    spark.stop()
  }
}
