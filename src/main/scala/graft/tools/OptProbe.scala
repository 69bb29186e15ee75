package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: split a query's wall time into DataFrame CONSTRUCTION
  * (builder code + analysis triggered by it), PLANNING
  * (analysis→optimization→physical planning of the final frame) and
  * EXECUTION (noop write), after one untimed warmup pass — the guide §1
  * "decide whether the time is compute, shuffle or the driver" step for
  * a harness whose UI is disabled. A query whose planning leg dominates
  * has a duplicated-subtree / giant-plan problem (guide §7.3), not a
  * data problem.
  *
  * Usage: sbt "runMain graft.tools.OptProbe <sfDir> <query> [query...]"
  */
object OptProbe {

  /** Per-job wall/stage/task accounting (UI is disabled in this sandbox,
    * so this stands in for the Stages tab).
    */
  private final class JobTally extends org.apache.spark.scheduler.SparkListener {
    case class J(desc: String, t0: Long, var t1: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, J]
    val stageToJob = scala.collection.concurrent.TrieMap.empty[Int, Int]
    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs(e.jobId) = J(String.valueOf(e.properties.getProperty("spark.job.description")), e.time)
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
    }
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
        j.stages += 1; j.tasks += e.stageInfo.numTasks
      }
    def reset(): Unit = { jobs.clear(); stageToJob.clear() }
    def report(top: Int): Unit = {
      val done = jobs.values.filter(_.t1 > 0).toSeq.sortBy(j => -(j.t1 - j.t0))
      println(f"[optprobe]   jobs=${done.size} total ${done.map(j => j.t1 - j.t0).sum / 1e3}%.2f s (sum of job walls)")
      done.take(top).foreach { j =>
        println(f"[optprobe]   ${(j.t1 - j.t0) / 1e3}%7.2f s stages=${j.stages}%3d tasks=${j.tasks}%5d  ${j.desc.take(90)}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val jobsTop = sys.env.get("OPTPROBE_JOBS").map(_.toInt).getOrElse(0)
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    val tally = new JobTally
    spark.sparkContext.addSparkListener(tally)

    def t[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[optprobe] $n warmup ERR $e") }
    }
    names.foreach { n =>
      System.gc()
      tally.reset()
      spark.sparkContext.setJobDescription(s"$n: build")
      val (df, build) = t(graft.SparkEntry.queries(n)(spark, dir))
      spark.sparkContext.setJobDescription(s"$n: plan")
      val (_, plan) = t(df.queryExecution.executedPlan)
      spark.sparkContext.setJobDescription(s"$n: exec")
      val (_, exec) = t(df.write.mode("overwrite").format("noop").save())
      spark.sparkContext.setJobDescription(null)
      println(f"[optprobe] $n%-28s build $build%6.2f s  plan $plan%6.2f s  exec $exec%6.2f s")
      if (jobsTop > 0) tally.report(jobsTop)
    }
    spark.stop()
  }
}
