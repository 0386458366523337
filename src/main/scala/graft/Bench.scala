package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line `{"metric":"total",...}`.
  *
  * Honesty + robustness rules (round-2/3 verdicts):
  *
  *   - Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and the MIN
  *     is reported; the full per-rep durations AND their wall-clock start
  *     offsets land in the JSON (`"reps"`, `"starts"`), so cold
  *     JIT/codegen, steady state, and machine contention are all
  *     distinguishable from the artifact alone.
  *   - A full WARM-UP pass runs first and is EXCLUDED from the stats
  *     (janino + C2 compilation of the generated stages would otherwise
  *     poison rep 1); its durations are recorded as `"warmup"` so
  *     warmup/min is the per-query cold-start cost.  After the scheduled
  *     passes, entries with spread/min > 30% (and min ≥ 200 ms) get two
  *     more interleaved passes; `"medians"` lands next to the min so
  *     round-over-round drift can be separated from rep noise.
  *   - Reps are INTERLEAVED as full passes over the query list (pass 1 runs
  *     every query once, then pass 2, ...), not back-to-back. Round-4
  *     measurement (docs/PLANS_r04.md) showed the host suffers multi-second
  *     stall episodes that rotate between runs — back-to-back reps let one
  *     episode poison every rep of a single query (the round-2/3
  *     "same-plan sibling 10x" anomalies); interleaving separates a query's
  *     reps by a whole pass (~a minute), so its min survives an episode.
  *   - `clearCache()` runs before EVERY timed execution: a query that
  *     persists intermediates (minhash signatures) must pay its full
  *     pipeline cost each rep — only JVM JIT state stays warm across
  *     passes (round-3 "What's wrong #2").
  *   - stdout carries ONLY the compact contract JSON
  *     (`{"metric","value","unit","queries","sf"}`) as the final line; the
  *     full telemetry (`"reps"`, `"starts"`) lands in SPARK_GRAFT_BENCH_OUT
  *     (default bench_out.json).  Round 4 printed the full ~8.6 KB line to
  *     stdout and the driver's tail capture truncated it (`BENCH_r04.json`
  *     came back `parsed: null`) — the channel has a size budget, so the
  *     per-rep diagnostics stay file-side only.  build.sbt's
  *     `run / outputStrategy := StdoutOutput` keeps the printed line clean
  *     of sbt's "[info] " prefix (broke BENCH_r01/r02 parsing).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.parquet stores TIMESTAMP(NANOS); session-builder is the one
      // sanctioned place for this legacy flag (Sources.events requires it).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session startup, codegen infra, parquet footers, and
    // the OS page cache would otherwise land entirely on whichever query
    // happens to run first.  Touch every table the registry reads.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // Above gate scale the exact single-task scaffolds are demoted to
    // their registered twins (r11 verdict #5) — logged, never silent;
    // GRAFT_RUN_EXACT=1 restores them.
    val demoted = SparkEntry.demotedAt(sfDir)
    demoted.foreach { case (n, twin) =>
      System.err.println(s"[bench] $n skipped above gate scale " +
        s"(exact scaffold; production twin $twin is in the run)")
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => demoted.contains(n) }
    val benchT0 = System.nanoTime()
    val samples = // query -> per-pass (startOffsetSec, durationSec)
      scala.collection.mutable.LinkedHashMap(
        queries.map { case (n, _) => n -> Vector.empty[(Double, Double)] }: _*)
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        into: scala.collection.mutable.LinkedHashMap[String, Vector[(Double, Double)]]): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // noop sink materializes every column of every row (a bare count()
      // would let Catalyst prune all columns and flatter the numbers).
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val t1 = System.nanoTime()
      into(name) = into.getOrElse(name, Vector.empty) :+
        ((t0 - benchT0) / 1e9, (t1 - t0) / 1e9)
    }
    // Pass 0: a full WARM-UP pass EXCLUDED from the stats (r9 verdict
    // #2/#3) — janino compilation + C2 JIT of each query's generated
    // stages land here instead of poisoning rep 1 (r9 saw 31 s cold vs
    // 3.6 s steady on the widest codegen).  The durations are still
    // RECORDED (`"warmup"` in bench_out.json): warmup/min is the
    // measured per-query cold-start cost, the diagnostic r7#4 asked for.
    val warmups =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[(Double, Double)]]
    for ((name, fn) <- queries) runOnce(name, fn, warmups)
    for (_ <- 1 to reps; (name, fn) <- queries) runOnce(name, fn, samples)
    // Adaptive reps (r9 verdict #2): entries whose spread/min exceeds
    // 30% after the scheduled passes get TWO more interleaved passes, so
    // min-of-reps on the heavy families survives the host's rotating
    // stall episodes and round-over-round deltas become attributable.
    // Sub-200ms entries are exempt (their spread is scheduler noise).
    for (_ <- 1 to 2) {
      val noisy = queries.filter { case (n, _) =>
        val ds = samples(n).map(_._2)
        ds.nonEmpty && ds.min >= 0.2 && (ds.max - ds.min) / ds.min > 0.3
      }
      for ((name, fn) <- noisy) runOnce(name, fn, samples)
    }
    def obj(f: Vector[(Double, Double)] => String): String =
      samples.map { case (k, v) => s"\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
    val repArrays = obj(v => v.map(_._2).mkString("[", ",", "]"))
    val startArrays = obj(v =>
      v.map(s => f"${s._1}%.1f").mkString("[", ",", "]"))
    val total = samples.valuesIterator.map(_.map(_._2).min).sum
    // The driver keeps only the last 2000 stdout chars.  Full-precision
    // doubles (~2.45 KB at 64 queries) head-truncated the r5 line; ms
    // precision keeps it ~1.8 KB, with a 10 ms fallback should the
    // registry ever outgrow even that.
    // Basename only ("sf0.1") in the compact line: the full path costs 15
    // chars of the 2000-char window; bench_out.json keeps it complete.
    val sfName = new java.io.File(sfDir).getName
    // Host-speed canary (r12 verdict #5): a FIXED DuckDB probe set timed
    // in the SAME invocation, so every wall ships with its own yardstick
    // and cross-round comparisons can be normalized by the canary ratio
    // (the r12 host-drift lesson: 2-4x between boots on unchanged code).
    // Runs AFTER the timed passes so it never perturbs the Spark walls.
    // The script path is RESOLVED, not assumed relative (r13 ADVICE #3):
    // a Bench launched from any cwd other than the repo root would
    // otherwise silently ship canary:null, defeating the yardstick.
    // Resolution order: GRAFT_REPO_ROOT env, the cwd, then walking up
    // from this class's code location (target/scala-2.13/... lives a few
    // levels under the repo root).  A null canary warns on stderr.
    val canaryScript: Option[java.io.File] = {
      val rel = "scripts/canary_duck.py"
      val fromEnv = sys.env.get("GRAFT_REPO_ROOT")
        .map(r => new java.io.File(r, rel))
      val fromCwd = Some(new java.io.File(rel))
      val fromClass = try {
        val src = new java.io.File(getClass.getProtectionDomain
          .getCodeSource.getLocation.toURI)
        Iterator.iterate(src)(_.getParentFile).takeWhile(_ != null)
          .map(d => new java.io.File(d, rel)).find(_.isFile)
      } catch { case _: Throwable => None }
      (fromEnv ++ fromCwd ++ fromClass).find(_.isFile)
    }
    val canary: String = canaryScript match {
      case None =>
        System.err.println("[bench] WARNING: scripts/canary_duck.py not " +
          "found from env/cwd/classpath — canary:null, walls have no " +
          "host-speed yardstick")
        "null"
      case Some(script) => try {
        val out = scala.sys.process.Process(
          Seq("python3", script.getAbsolutePath, sfDir, "3")).!!.trim
        val last = out.linesIterator.toSeq.lastOption.getOrElse("null")
        if (last.startsWith("{")) last
        else {
          System.err.println("[bench] WARNING: canary produced no JSON " +
            s"(last line: $last) — canary:null")
          "null"
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] WARNING: canary failed ($e) — canary:null")
        "null"
      }
    }
    val canaryTotal = "\"canary_total\":\\s*([0-9.]+)".r
      .findFirstMatchIn(canary).map(_.group(1)).getOrElse("null")
    def compactAt(dec: Int) = {
      val qs = obj(v => s"%.${dec}f".format(v.map(_._2).min))
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","canary":$canaryTotal,"queries":$qs,"sf":"$sfName"}"""
    }
    // Last-resort tier: greedily keep the SLOWEST queries that still fit
    // the window (full set always lands in bench_out.json), so the line
    // NEVER outgrows the window no matter how large the registry gets and
    // the driver always sees the queries that dominate the total.
    def compactFit() = {
      val sorted = samples.toSeq.map { case (k, v) => k -> v.map(_._2).min }
        .sortBy { case (k, m) => (-m, k) }
        .map { case (k, m) => s"\"" + k + "\":" + f"$m%.2f" }
      val shell = s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","canary":$canaryTotal,"queries":{},"sf":"$sfName"}"""
      var budget = 1900 - shell.length
      val kept = sorted.takeWhile { e =>
        val cost = e.length + 1
        val ok = budget >= cost
        if (ok) budget -= cost
        ok
      }
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","canary":$canaryTotal,"queries":${kept.mkString("{", ",", "}")},"sf":"$sfName"}"""
    }
    val compact = {
      val c3 = compactAt(3)
      if (c3.length <= 1900) c3
      else { val c2 = compactAt(2); if (c2.length <= 1900) c2 else compactFit() }
    }
    val qsFull = obj(v => v.map(_._2).min.toString)
    def median(ds: Vector[Double]): Double = {
      val s = ds.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val medArrays = obj(v => f"${median(v.map(_._2))}%.3f")
    val warmArrays = warmups.map { case (k, v) =>
      s"\"" + k + "\":" + v.map(d => f"${d._2}%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","canary":$canary,"queries":$qsFull,"medians":$medArrays,"warmup":$warmArrays,"reps":$repArrays,"starts":$startArrays,"sf":"$sfDir"}"""
    try Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), full)
    catch { case _: Throwable => }
    println(compact)
    spark.stop()
  }
}
