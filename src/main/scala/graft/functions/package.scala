package graft

/** graft's custom Catalyst expressions. The implementations live under
  * `org.apache.spark.sql.graft` (they need Spark's `private[sql]`
  * Expression plumbing); this package object is the graft-side surface.
  */
package object functions {
  val CircularCorrelation: org.apache.spark.sql.graft.CircularCorrelation.type =
    org.apache.spark.sql.graft.CircularCorrelation

  val VectorFolds: org.apache.spark.sql.graft.VectorFolds.type =
    org.apache.spark.sql.graft.VectorFolds

  val TopK: org.apache.spark.sql.graft.TopKAgg.type =
    org.apache.spark.sql.graft.TopKAgg
}
