package graft.core

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Harness log hygiene (VERDICT r7 item 8).
  *
  * Every unpartitioned window in graft is over a BOUNDED frame (the
  * audited sites: post-limit top-N ranks, the 64-row dictionary offset
  * cumsum — PlanGuardSpec rejects any unbounded one), but WindowExec
  * still emits its single-partition WARN once per plan, flooding
  * hundreds of lines into bench/verify stdout (they truncated
  * BENCH_r07's tail). The warning is raised per-category, so the
  * surgical fix is one category filter — everything else stays at the
  * session's WARN level, and a future genuinely-unbounded window is
  * still caught by the PlanGuardSpec test rather than by log grep.
  */
object Logs {

  /** Demote the known-bounded WindowExec warning category to ERROR. */
  def quietBoundedWindowWarnings(): Unit =
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
}
