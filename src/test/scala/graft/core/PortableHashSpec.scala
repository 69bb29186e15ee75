package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PortableHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** JVM-side mirror of the hash, used as the independent reference. */
  private def refPHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("pHash matches an independent md5 computation") {
    val inputs = Seq("", "a", "E|17|3", "hello world", "äöü-unicode")
    val got = inputs.toDF("s")
      .select(PortableHash.pHash(col("s"))).as[Long].collect()
    assert(got.toSeq == inputs.map(refPHash))
  }

  test("dyadic values are exactly representable k/128 in [-100/128, 100/128]") {
    val got = (0 until 200).map(i => s"seed$i").toDF("s")
      .select(PortableHash.dyadic(col("s"))).as[Double].collect()
    got.foreach { v =>
      assert(v * 128 == math.rint(v * 128), s"$v not dyadic/128")
      assert(math.abs(v) <= 100.0 / 128.0)
    }
    // not degenerate: at least a handful of distinct values
    assert(got.distinct.length > 50)
  }
}
