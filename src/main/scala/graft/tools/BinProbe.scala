package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: localize embed_binarize_hamming's time at scale. */
object BinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[binprobe] $label%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s")
      r
    }
    import graft.ann.Binarize
    val e0 = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Binarize.signature(col("v"), 0).as("sig_lo"),
        Binarize.signature(col("v"), Binarize.BitsPerWord).as("sig_hi"))
    // Materialize signatures as pure longs; everything below reads this.
    time("write sigs parquet") {
      e0.write.mode("overwrite").parquet("/tmp/binprobe_sigs")
    }
    val e = spark.read.parquet("/tmp/binprobe_sigs")
    val q = e.filter(col("vec_id") % graft.ann.Ann.QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("sig_lo").as("q_lo"),
        col("sig_hi").as("q_hi"))
    def ham = expr("bit_count(sig_lo ^ q_lo) + bit_count(sig_hi ^ q_hi)")

    // A: BNLJ inequality join (current shape) over pure-long inputs
    val a = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("hamming", ham)
    time("A bnlj ineq, sum") {
      println("  " + a.groupBy().agg(sum("hamming")).collect()(0))
    }
    // B: crossJoin then filter
    val b = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming", ham)
    time("B cross+filter, sum") {
      println("  " + b.groupBy().agg(sum("hamming")).collect()(0))
    }
    // C: literal query array + posexplode (no join at all)
    val qRows = q.collect()
    val qArr = array(qRows.map(r => struct(
      lit(r.getLong(0)).as("q_id"), lit(r.getLong(1)).as("q_lo"),
      lit(r.getLong(2)).as("q_hi"))): _*)
    val c = e.select(col("vec_id"), col("sig_lo"), col("sig_hi"),
        posexplode(qArr).as(Seq("qi", "qs")))
      .filter(col("vec_id") =!= col("qs.q_id"))
      .select(col("qs.q_id").as("q_id"), col("vec_id"),
        (expr("bit_count(sig_lo ^ qs.q_lo)") +
         expr("bit_count(sig_hi ^ qs.q_hi)")).as("hamming"))
    time("C literal explode, sum") {
      println("  " + c.groupBy().agg(sum("hamming")).collect()(0))
    }
    // D: A through TopKAgg (the full current agg)
    time("D bnlj + topk") {
      println("  n=" + a.groupBy("q_id")
        .agg(graft.functions.TopK.topkMin(col("hamming").cast("double"),
          col("vec_id"), graft.ann.Ann.K).as("tk"))
        .select(sum(size(col("tk")))).collect()(0))
    }
    // E: C through TopKAgg
    time("E explode + topk") {
      println("  n=" + c.groupBy("q_id")
        .agg(graft.functions.TopK.topkMin(col("hamming").cast("double"),
          col("vec_id"), graft.ann.Ann.K).as("tk"))
        .select(sum(size(col("tk")))).collect()(0))
    }
    spark.stop()
  }
}
