package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: output row counts of registered queries at an SF —
  * distinguishes superlinear RUNTIME from superlinear OUTPUT (a dedup
  * join whose true pair set grows quadratically on a replicated corpus
  * is slow because the answer is big, not because the plan broke).
  *
  * Usage: sbt "runMain graft.tools.RowCount <sfDir> <query> [query...]"
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    args.tail.foreach { n =>
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      println(s"ROWS $n $c")
    }
    spark.stop()
  }
}
