package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LossProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    // reproduce logisticLoss's per-term frame and dump (ys, l) for diffing
    val m = classOf[graft.kge.Losses.type]
    val scored = {
      val f = graft.kge.Losses.getClass.getDeclaredMethod("scored",
        classOf[SparkSession], classOf[String])
      f.setAccessible(true)
      f.invoke(graft.kge.Losses, spark, "/root/testdata/sf0.1")
        .asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    scored.select(explode(array(col("s_pos").as("ys"), (-col("s_neg")).as("ys"))).as("ys"))
      .select(col("ys"),
        (log(lit(1.0) + exp(-col("ys")))).as("l_raw"),
        col("ys").cast("decimal(28,4)").cast("double").as("ys_r4chk"),
        log(lit(1.0) + exp(-col("ys"))).cast("decimal(28,4)").cast("double").as("l_r4_spark"))
      .write.mode("overwrite").parquet("/tmp/loss_terms_spark")
    spark.stop()
  }
}
