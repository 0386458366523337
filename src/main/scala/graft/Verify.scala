package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg (builder-local iteration only; the driver passes
    // two): comma-separated name-prefix filter, e.g. "q_an_funnel,q_text".
    val keep: String => Boolean = args.lift(2) match {
      case Some(p) => name => p.split(',').exists(name.startsWith)
      case None    => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Builder-local resume (GRAFT_VERIFY_RESUME=1): skip queries whose
    // output already landed (_SUCCESS present) — lets a multi-hour sf10
    // sweep continue after a restart instead of recomputing everything.
    // The driver never sets this, so its gate always recomputes.
    val resume = sys.env.get("GRAFT_VERIFY_RESUME").contains("1")
    // Deterministic alphabetical order (the registry Map's hash order is
    // arbitrary) so progress is legible and resume points are stable.
    // Above gate scale the exact single-task scaffolds are demoted to
    // their registered twins (r11 verdict #5).  Gate scales (the
    // driver's sf0.01 run) are unaffected; GRAFT_RUN_EXACT=1 restores
    // them for an everything-for-real sweep.
    val demoted = SparkEntry.demotedAt(sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1).filter(kv => keep(kv._1))
      .foreach { case (name, fn) =>
        val done = new java.io.File(s"$outDir/$name/_SUCCESS").exists()
        if (demoted.contains(name))
          System.err.println(s"[verify] $name skipped above gate scale " +
            s"(exact scaffold; production twin ${demoted(name)} is in the run)")
        else if (resume && done)
          System.err.println(s"[verify] $name skipped (resume)")
        else {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(f"[verify] $name ok in " +
              f"${(System.nanoTime() - t0) / 1e9}%.1f s")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
        // Persisted intermediates (e.g. minhash signatures) are per-query;
        // drop them so cached blocks don't accumulate across the queries
        // sharing this session.
        spark.catalog.clearCache()
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
