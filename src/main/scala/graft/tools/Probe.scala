package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-by-stage timing of the shared RDF/tensor pipeline to
  * localize where a slow query's time actually goes.
  *
  * Usage: sbt "runMain graft.tools.Probe [sfDir]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s")
      r
    }
    time("triples count") { graft.core.TpchGraph.triples(spark, dir).count() }
    time("entities count") { graft.rdf.Dict.entities(spark, dir).count() }
    time("encoded count") { graft.rdf.Dict.encodedTriples(spark, dir).count() }
    time("mttkrp count") { graft.tensor.Mttkrp.cpMttkrp(spark, dir).count() }
    time("mttkrp write") {
      graft.tensor.Mttkrp.cpMttkrp(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet("/tmp/probe_mttkrp")
    }
    time("mttkrp write 2nd") {
      graft.tensor.Mttkrp.cpMttkrp(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet("/tmp/probe_mttkrp2")
    }
    spark.stop()
  }
}
