package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: the recorded scale-smoke artifact (round-5 VERDICT item 7).
  * Synthesizes sf1 (10× sf0.1, key-shifted replication via [[ScaleUp]])
  * if absent, then runs the full [[graft.Bench]] headline against it,
  * writing BENCH_sf1.json next to the per-round BENCH files — so
  * scaling-curvature regressions (a query going superlinear between
  * rounds) are diffable artifacts instead of SURVEY prose.
  *
  * Usage: sbt "runMain graft.tools.BenchScale [srcSf] [dstDir] [out]"
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val out = args.lift(2).getOrElse("BENCH_sf1.json")
    if (!Files.exists(Paths.get(dst, "lineitem.parquet")))
      ScaleUp.main(Array(src, dst, "10"))
    graft.Bench.run(dst, out)
  }
}
