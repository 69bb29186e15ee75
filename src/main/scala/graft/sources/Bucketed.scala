package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

/** #114: bucketed tables + co-located join — the OTHER half of the
  * 100 TB layout story next to partition pruning (#113): pre-hash both
  * fact tables into the same bucket space on the join key at WRITE
  * time, and every subsequent join on that key runs with NO exchange —
  * each task reads bucket i of both sides. At corpus scale this turns
  * the recurring orders⋈lineitem shuffle (the largest single data
  * movement in the star schema) into a local merge per bucket, paid
  * once at layout time instead of per query.
  *
  * The query writes both sides `bucketBy(8, orderkey)` (in-memory
  * catalog — parquet under the session warehouse; no Hive dependency),
  * then joins and aggregates revenue per order priority. `hint("merge")`
  * pins sort-merge so the demonstration is about the EXCHANGE, not the
  * join algorithm (AQE would otherwise broadcast at test SFs).
  * BucketedSpec asserts the physical plan has zero shuffle exchanges.
  *
  * Oracle: the same join+agg over the raw tables — bucketing must not
  * change a single value, only the plan.
  */
object Bucketed {

  val Buckets = 8

  /** Drop the table AND its warehouse directory: the in-memory catalog
    * dies with the JVM but the directory persists, and a fresh session's
    * CTAS refuses a leftover location (LOCATION_ALREADY_EXISTS).
    */
  private def freshTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(wh, true)
  }

  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val tag = math.abs(dir.hashCode).toString
    val ot = s"graft_buck_orders_$tag"
    val lt = s"graft_buck_lineitem_$tag"
    freshTable(spark, ot)
    freshTable(spark, lt)
    Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").format("parquet")
      .bucketBy(Buckets, "o_orderkey").saveAsTable(ot)
    Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").format("parquet")
      .bucketBy(Buckets, "l_orderkey").saveAsTable(lt)
    spark.table(ot).hint("merge")
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        Exact.decSum(col("l_extendedprice"), 2).as("revenue"))
  }

  val bucketedJoinSql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  ${Exact.duckSum("l_extendedprice", 2)} AS revenue
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority""".stripMargin
}
