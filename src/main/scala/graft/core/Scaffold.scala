package graft.core

import org.slf4j.LoggerFactory

/** Audit labels for the EXACT single-task formulations (r9 verdict
  * next-round #5).  A handful of analytics entries (exact percentiles,
  * MAD, equi-depth histogram boundaries, IQR outlier fences) deliberately
  * run ONE global-order pass — a single-task sort — because the
  * cross-engine gate hash-compares their output against DuckDB's exact
  * answer, and every one of them has a registered SKETCH TWIN that is the
  * production form at scale.  Spark warns `WindowExec: No Partition
  * Defined` on these plans; this logger makes the warning self-explaining
  * in the bench/driver stderr by naming the twin right where the exact
  * plan is built, so an operator reading the log knows the swap is
  * documented, not forgotten. */
object Scaffold {
  private val log = LoggerFactory.getLogger("graft.scaffold")

  /** Call when BUILDING an exact global-order plan: names the operator
    * and its registered scale twin.  One line, INFO level. */
  def exactTwin(op: String, twin: String): Unit =
    log.info(s"$op builds an exact single-task global-order pass by " +
      s"design (cross-engine hash gate); the registered scale twin is " +
      s"$twin — use it at production scale")
}
