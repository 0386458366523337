package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.core.TxLog

/** The commit-log table format: ACID-on-any-store semantics the rename
  * chains ([[graft.core.Sinks.swapInto]]) can only give where rename is
  * atomic.  Every contract here is the one Delta/Iceberg publish:
  * commits are all-or-nothing, readers see snapshots, old versions stay
  * readable until vacuum, concurrent writers serialize through the
  * version claim. */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_txlog").toString + "/t"

  private def rows(path: String, asOf: Option[Long] = None): Seq[(Int, String)] =
    TxLog.read(spark, path, asOf).as[(Int, String)]
      .collect().sortBy(_._1).toSeq

  test("append commits are replayed in order; versions are monotonic") {
    val t = tmp()
    val v1 = TxLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val v2 = TxLog.append(spark, Seq((3, "c")).toDF("k", "v"), t)
    assert(v1 == 1L && v2 == 2L)
    assert(rows(t) == Seq((1, "a"), (2, "b"), (3, "c")))
    assert(TxLog.snapshot(spark, t).version == 2L)
  }

  test("overwriteAll replaces content atomically; time travel reads history") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val v2 = TxLog.overwriteAll(spark, Seq((9, "z")).toDF("k", "v"), t)
    assert(v2 == 2L)
    assert(rows(t) == Seq((9, "z")))
    // The pre-overwrite version is still fully readable (tombstones,
    // not deletes).
    assert(rows(t, asOf = Some(1L)) == Seq((1, "a"), (2, "b")))
    // Unknown versions fail loudly, naming what exists.
    val e = intercept[IllegalArgumentException] {
      TxLog.read(spark, t, Some(7L))
    }
    assert(e.getMessage.contains("version 7"))
  }

  test("a crashed writer's staged data files are invisible") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    // Simulate a writer that staged data but died before publishing:
    // files land under data/<uuid> with no commit referencing them.
    Seq((666, "ghost")).toDF("k", "v")
      .write.parquet(s"$t/data/deadbeef-dead-dead-dead-deaddeadbeef")
    assert(rows(t) == Seq((1, "a")), "uncommitted data must not be read")
    // And the next commit does not resurrect them.
    TxLog.append(spark, Seq((2, "b")).toDF("k", "v"), t)
    assert(rows(t) == Seq((1, "a"), (2, "b")))
  }

  test("no-rename store: the whole commit protocol runs on conditional-create alone (r10 #4)") {
    // The scaladoc caveat said object stores "need a CAS primitive behind
    // the same call"; this proves it's the ONLY thing they need: a store
    // whose rename THROWS on every log path runs the full crash-window
    // suite — publish, claim race, crashed writer, exactly-once replay,
    // checkpoint — through the hard-link (conditional-create) claim.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.norename.impl", classOf[NoRenameFileSystem].getName)
    conf.set("fs.norename.impl.disable.cache", "false")
    // Registered for THIS test only: linkClaimSchemes is production-global
    // mutable state, and leaking "norename" would silently put every later
    // test in the JVM on the hard-link claim path (r11 advice).
    TxLog.linkClaimSchemes.add("norename")
    try norenameBody(conf)
    finally TxLog.linkClaimSchemes.remove("norename")
  }

  private def norenameBody(conf: org.apache.hadoop.conf.Configuration): Unit = {
    val t = "norename://" + tmp()
    // Publish + replay.
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    TxLog.append(spark, Seq((2, "b")).toDF("k", "v"), t)
    assert(rows(t) == Seq((1, "a"), (2, "b")))
    // The shim really does forbid log renames.
    val fs = new Path(t).getFileSystem(conf)
    assert(fs.isInstanceOf[NoRenameFileSystem])
    intercept[UnsupportedOperationException] {
      fs.rename(new Path(s"$t/_txlog/x"), new Path(s"$t/_txlog/y"))
    }
    // Crashed writer: staged-but-unpublished data stays invisible.
    Seq((666, "ghost")).toDF("k", "v")
      .write.parquet(s"$t/data/deadbeef-dead-dead-dead-deaddeadbeef")
    assert(rows(t) == Seq((1, "a"), (2, "b")))
    // Claim race: a stolen version forces the retry path (the loser's
    // conditional create must fail, not overwrite).
    val stolen = new Path(s"$t/_txlog/${"%020d".format(3)}.json")
    val out = fs.create(stolen, false)
    out.write("\n".getBytes("UTF-8")); out.close()
    assert(TxLog.append(spark, Seq((3, "c")).toDF("k", "v"), t) == 4L)
    assert(rows(t) == Seq((1, "a"), (2, "b"), (3, "c")))
    // Exactly-once replay window.
    assert(TxLog.appendBatch(spark, Seq((4, "d")).toDF("k", "v"), t, "app", 0L))
    assert(!TxLog.appendBatch(spark, Seq((4, "d")).toDF("k", "v"), t, "app", 0L))
    assert(rows(t) == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // Checkpoint publishes through the same claim.
    assert(TxLog.checkpoint(spark, t) > 0L)
    assert(rows(t) == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
  }

  test("version claim is first-writer-wins: a lost append retries past it") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    // A "concurrent writer" claims version 2 out from under this session
    // (an empty commit — no actions — keeps the replay well-formed).
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stolen = new Path(s"$t/_txlog/${"%020d".format(2)}.json")
    val out = fs.create(stolen, false)
    out.write("\n".getBytes("UTF-8")); out.close()
    // An append re-reads the log and lands at version 3.
    val v = TxLog.append(spark, Seq((2, "b")).toDF("k", "v"), t)
    assert(v == 3L)
    assert(rows(t) == Seq((1, "a"), (2, "b")))
  }

  test("compact rewrites the layout without changing rows; old snapshot survives") {
    val t = tmp()
    val df = (1 to 500).map(i => (i, s"v$i")).toDF("k", "v").repartition(8)
    TxLog.append(spark, df, t)
    val before = TxLog.snapshot(spark, t)
    assert(before.files.size > 1)
    val v2 = TxLog.compact(spark, t, files = 1)
    assert(v2 == 2L)
    val after = TxLog.snapshot(spark, t)
    assert(after.files.size == 1)
    assert(rows(t).size == 500)
    // Pre-compaction snapshot still reads (files tombstoned, not deleted).
    assert(rows(t, asOf = Some(1L)).size == 500)
  }

  test("vacuum reclaims files unreachable from kept versions") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    TxLog.overwriteAll(spark, Seq((9, "z")).toDF("k", "v"), t)
    // Keep only v2 and later: v1's files are dead.
    val deleted = TxLog.vacuum(spark, t, keepFrom = 2L)
    assert(deleted > 0)
    // The live snapshot is untouched...
    assert(rows(t) == Seq((9, "z")))
    // ...and vacuum is idempotent.
    assert(TxLog.vacuum(spark, t, keepFrom = 2L) == 0)
    // Time travel to the vacuumed version now fails at scan time.
    intercept[Exception] { rows(t, asOf = Some(1L)) }
  }

  test("snapshot isolation: a pinned snapshot's files never change under it") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    val pinned = TxLog.snapshot(spark, t)
    TxLog.overwriteAll(spark, Seq((9, "z")).toDF("k", "v"), t)
    TxLog.compact(spark, t)
    // The pinned file list still resolves to the v1 content (no vacuum
    // has run), even though the table has moved two versions on.
    val got = spark.read
      .parquet(pinned.files.map(f => s"$t/$f"): _*)
      .as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a")))
    assert(TxLog.snapshot(spark, t).version == 3L)
  }

  test("checkpoint + log retention: reads survive commit-file pruning") {
    val t = tmp()
    for (i <- 1 to 4)
      TxLog.append(spark, Seq((i, s"v$i")).toDF("k", "v"), t)
    assert(TxLog.checkpoint(spark, t) == 4L)
    TxLog.append(spark, Seq((5, "v5")).toDF("k", "v"), t)
    TxLog.append(spark, Seq((6, "v6")).toDF("k", "v"), t)
    // Checkpointed replay equals full replay, latest and as-of.
    assert(rows(t).map(_._1) == (1 to 6))
    assert(rows(t, asOf = Some(5L)).map(_._1) == (1 to 5))
    // Retention: the checkpoint subsumes commits 1..4 — delete them.
    assert(TxLog.cleanupLog(spark, t, keepFrom = 4L) == 4)
    // Everything at or after the checkpoint still reads correctly...
    assert(rows(t).map(_._1) == (1 to 6))
    assert(rows(t, asOf = Some(4L)).map(_._1) == (1 to 4))
    assert(rows(t, asOf = Some(5L)).map(_._1) == (1 to 5))
    // ...and pre-checkpoint versions are pruned history, loudly.
    val e = intercept[IllegalArgumentException] {
      TxLog.read(spark, t, Some(2L))
    }
    assert(e.getMessage.contains("pruned"))
    // Cleanup without a qualifying checkpoint is a refusal, not a wipe.
    assert(TxLog.cleanupLog(spark, t, keepFrom = 3L) == 0)
    // Checkpoint is idempotent at an unchanged version.
    TxLog.checkpoint(spark, t)
    assert(TxLog.checkpoint(spark, t) == 6L)
    assert(rows(t).map(_._1) == (1 to 6))
  }

  test("history lists surviving commits with action counts") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    TxLog.appendBatch(spark, Seq((3, "c")).toDF("k", "v"), t, "job", 0L)
    TxLog.overwriteAll(spark, Seq((9, "z")).toDF("k", "v"), t)
    TxLog.checkpoint(spark, t)
    val h = TxLog.history(spark, t)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(h.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(h(1)._4 == 1L) // the appendBatch commit carries a txn marker
    assert(h(2)._3 > 0L)  // the overwrite removed prior files
    assert(h(2)._5)       // checkpointed at the latest version
    assert(!h(0)._5)
  }

  test("deleteWhere rewrites only the files containing matches") {
    import org.apache.spark.sql.functions.col
    val t = tmp()
    // Three commits → three single-file adds; keys 1, 2, 3.
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    TxLog.append(spark, Seq((2, "b")).toDF("k", "v"), t)
    TxLog.append(spark, Seq((3, "c")).toDF("k", "v"), t)
    val before = TxLog.snapshot(spark, t)
    val v = TxLog.deleteWhere(spark, t, col("k") === 2)
    assert(v == 4L)
    assert(rows(t) == Seq((1, "a"), (3, "c")))
    val after = TxLog.snapshot(spark, t)
    // The k=1 and k=3 files are CARRIED BY REFERENCE — same relative
    // paths, bytes never rewritten; only k=2's file left the live set.
    val untouched = before.files.filterNot { f =>
      spark.read.parquet(s"$t/$f").filter(col("k") === 2).count() > 0
    }
    assert(untouched.forall(after.files.contains))
    assert(untouched.size == 2)
    // Audit trail: the pre-delete version still shows the deleted row.
    assert(rows(t, asOf = Some(3L)) == Seq((1, "a"), (2, "b"), (3, "c")))
    // Idempotent: nothing left to match, version does not advance.
    assert(TxLog.deleteWhere(spark, t, col("k") === 2) == 4L)
    // NULL-predicate rows survive (SQL DELETE semantics).
    TxLog.append(spark,
      Seq((Some(9), "z"), (None, "nul")).toDF("k", "v"), t)
    TxLog.deleteWhere(spark, t, col("k") === 9)
    assert(TxLog.read(spark, t).where(col("v") === "nul").count() == 1)
  }

  test("appendBatch is exactly-once: a replayed (app, batch) is skipped") {
    val t = tmp()
    assert(TxLog.appendBatch(spark, Seq((1, "a")).toDF("k", "v"), t,
      "job", 0L))
    assert(TxLog.appendBatch(spark, Seq((2, "b")).toDF("k", "v"), t,
      "job", 1L))
    // The at-least-once window: batch 1 replays after a crash between
    // the sink commit and the checkpoint write.  Content must not double.
    assert(!TxLog.appendBatch(spark, Seq((2, "b")).toDF("k", "v"), t,
      "job", 1L))
    assert(rows(t) == Seq((1, "a"), (2, "b")))
    assert(TxLog.lastCommittedBatch(spark, t, "job").contains(1L))
    // A different app's ledger is independent.
    assert(TxLog.lastCommittedBatch(spark, t, "other").isEmpty)
    assert(TxLog.appendBatch(spark, Seq((3, "c")).toDF("k", "v"), t,
      "other", 0L))
    assert(rows(t) == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("streaming append sink: micro-batches land atomically, stream equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = tmp()
    val ckpt = Files.createTempDirectory("graft_txlog_ckpt").toString
    val stream = MemoryStream[(Int, String)]
    val q = TxLog.writeStreamAppend(
      stream.toDF().toDF("k", "v"), t, ckpt, "stream-test")
    try {
      stream.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      stream.addData((3, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(t) == Seq((1, "a"), (2, "b"), (3, "c")))
    // One commit per non-empty micro-batch, each carrying its txn marker.
    assert(TxLog.lastCommittedBatch(spark, t, "stream-test").nonEmpty)
  }

  test("concurrent appenders all land: no lost updates under contention") {
    val t = tmp()
    // 4 writer threads x 3 appends, all racing the version claim.
    // Every append must land exactly once (the retry loop re-reads the
    // log on a lost claim) — 12 commits, 12 rows, no gaps.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            for (i <- 0 until 3)
              TxLog.append(spark,
                Seq((w * 10 + i, s"w$w-$i")).toDF("k", "v"), t)
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val snap = TxLog.snapshot(spark, t)
    assert(snap.version == 12L, "every append claimed a distinct version")
    val got = rows(t)
    assert(got.size == 12)
    assert(got.map(_._1).toSet ==
      (for (w <- 0 until 4; i <- 0 until 3) yield w * 10 + i).toSet)
  }

  test("data skipping: stats prune files a range predicate can't match") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = tmp()
    // Three single-file appends with disjoint key ranges → tight stats.
    TxLog.append(spark, (1 to 10).map(i => (i, s"a$i")).toDF("k", "v")
      .coalesce(1), t)
    TxLog.append(spark, (11 to 20).map(i => (i, s"b$i")).toDF("k", "v")
      .coalesce(1), t)
    TxLog.append(spark, (21 to 30).map(i => (i, s"c$i")).toDF("k", "v")
      .coalesce(1), t)
    assert(TxLog.snapshot(spark, t).files.size == 3)
    // A point lookup opens ONE file...
    val (_, kept1) = TxLog.pruneFiles(spark, t, col("k") === 15)
    assert(kept1.size == 1)
    // ...a range straddling two chunks opens two...
    val (_, kept2) = TxLog.pruneFiles(spark, t,
      col("k") >= 18 && col("k") <= 23)
    assert(kept2.size == 2)
    // ...IN prunes to the chunks containing any member...
    val (_, keptIn) = TxLog.pruneFiles(spark, t,
      col("k").isin(2, 25))
    assert(keptIn.size == 2)
    // ...OR keeps the union, literal-first comparisons flip correctly...
    val (_, keptOr) = TxLog.pruneFiles(spark, t,
      col("k") < 5 || (lit(28) < col("k")))
    assert(keptOr.size == 2)
    // ...and a predicate shape the pruner doesn't understand keeps all.
    val (_, keptAll) = TxLog.pruneFiles(spark, t,
      col("v").startsWith("a"))
    assert(keptAll.size == 3)
    // Semantics are byte-identical to the unpruned filter, always.
    def got(p: org.apache.spark.sql.Column) =
      TxLog.readWhere(spark, t, p).as[(Int, String)]
        .collect().sortBy(_._1).toSeq
    assert(got(col("k") === 15) == Seq((15, "b15")))
    assert(got(col("k") >= 18 && col("k") <= 23).map(_._1) == (18 to 23))
    assert(got(col("k") > 100).isEmpty) // every file pruned, empty frame
    // Stats survive checkpoint + log retention.
    TxLog.checkpoint(spark, t)
    TxLog.cleanupLog(spark, t, keepFrom = 3L)
    val (_, keptCp) = TxLog.pruneFiles(spark, t, col("k") === 15)
    assert(keptCp.size == 1)
  }

  test("data skipping: an all-null stat column proves comparisons false") {
    import org.apache.spark.sql.functions.col
    val t = tmp()
    TxLog.append(spark,
      Seq((Option.empty[Int], "x"), (Option.empty[Int], "y"))
        .toDF("k", "v").coalesce(1), t)
    TxLog.append(spark, Seq((Some(5), "z")).toDF("k", "v"), t)
    // No value of k in file 1 can satisfy k = 5 (NULL comparisons are
    // never TRUE), so stats skip it outright.
    val (_, kept) = TxLog.pruneFiles(spark, t, col("k") === 5)
    assert(kept.size == 1)
    // An isNull predicate is NOT prunable — conservative keep-all.
    val (_, keptNull) = TxLog.pruneFiles(spark, t, col("k").isNull)
    assert(keptNull.size == 2)
    assert(TxLog.readWhere(spark, t, col("k").isNull).count() == 2)
  }

  test("z-order compaction turns an unprunable layout into a skipping one") {
    import org.apache.spark.sql.functions.col
    val t = tmp()
    // 32x32 grid; four INTERLEAVED chunks (by row id modulo) — every
    // file spans the whole a and b domains, so stats can't skip.
    val grid = spark.range(1024).selectExpr(
      "CAST(id % 32 AS BIGINT) AS a", "CAST(id DIV 32 AS BIGINT) AS b",
      "id AS v")
    for (m <- 0 until 4)
      TxLog.append(spark, grid.filter(col("v") % 4 === m).coalesce(1), t)
    val (_, before) = TxLog.pruneFiles(spark, t, col("a") < 8)
    assert(before.size == 4, "interleaved layout: nothing prunable")
    // OPTIMIZE ZORDER: one ranged rewrite by the Morton key.
    TxLog.compactZOrder(spark, t, "a", "b", files = 4)
    // Z-range quartiles of a uniform grid are its quadrants: each file
    // now boxes HALF the a-domain, so a quarter-range predicate keeps
    // at most the two matching quadrant files.
    val (_, after) = TxLog.pruneFiles(spark, t, col("a") < 8)
    assert(after.size <= 2)
    // ...and on the OTHER dimension too — that's the point of z vs sort.
    val (_, afterB) = TxLog.pruneFiles(spark, t, col("b") >= 24)
    assert(afterB.size <= 2)
    // The rewrite changed layout only: schema z-free, rows intact.
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq ==
      Seq("a", "b", "v"))
    assert(TxLog.readWhere(spark, t, col("a") < 8).count() == 8 * 32)
    assert(TxLog.read(spark, t).count() == 1024)
  }

  test("schema evolution: appends widen, old files read NULL, time travel keeps the old schema") {
    import org.apache.spark.sql.functions.col
    val t = tmp()
    TxLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    // Widening append: new column w.
    TxLog.append(spark,
      Seq((3, "c", 30L), (4, "d", 40L)).toDF("k", "v", "w"), t)
    val latest = TxLog.read(spark, t)
    assert(latest.schema.fieldNames.toSeq == Seq("k", "v", "w"))
    val byK = latest.select("k", "w").as[(Int, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(byK == Seq((1, None), (2, None), (3, Some(30L)),
      (4, Some(40L))))
    // Time travel sees the schema AS OF the version.
    assert(TxLog.read(spark, t, Some(1L)).schema.fieldNames.toSeq ==
      Seq("k", "v"))
    // A column-subset append still reads with the FULL table schema.
    TxLog.append(spark, Seq((5, "e")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq ==
      Seq("k", "v", "w"))
    // Predicates on the evolved column work across pre-evolution files
    // (deleteWhere reads with the snapshot schema).
    TxLog.deleteWhere(spark, t, col("w") === 30L)
    assert(TxLog.read(spark, t).select("k").as[Int].collect().sorted
      .toSeq == Seq(1, 2, 4, 5))
    // A same-name TYPE change is rejected loudly, not coerced.
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark, Seq(("oops", "x")).toDF("k", "v"), t)
    }
    assert(e.getMessage.contains("schema conflict"))
    // Overwrite RESETS the schema (new table generation).
    TxLog.overwriteAll(spark, Seq((9, "z")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("deleteWhere commutes past a concurrent append, aborts on a concurrent rewrite") {
    import org.apache.spark.sql.functions.col
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    TxLog.append(spark, Seq((2, "b")).toDF("k", "v"), t)
    // A concurrent APPEND lands between the delete's snapshot and its
    // claim: the delete did not target the appended file, so it
    // commutes — the delete retries at the next version and both land.
    TxLog.deleteRaceHook = () => {
      TxLog.deleteRaceHook = () => ()
      TxLog.append(spark, Seq((3, "c")).toDF("k", "v"), t): Unit
    }
    try {
      val v = TxLog.deleteWhere(spark, t, col("k") === 2)
      assert(v == 4L) // append took 3, the delete re-claimed 4
    } finally TxLog.deleteRaceHook = () => ()
    assert(rows(t) == Seq((1, "a"), (3, "c")))
    // A concurrent commit that REMOVED a targeted file is a real
    // conflict: the delete must abort, not resurrect or double-delete.
    TxLog.deleteRaceHook = () => {
      TxLog.deleteRaceHook = () => ()
      TxLog.overwriteAll(spark, Seq((7, "q")).toDF("k", "v"), t): Unit
    }
    try {
      intercept[TxLog.ConcurrentRewrite] {
        TxLog.deleteWhere(spark, t, col("k") === 1)
      }
    } finally TxLog.deleteRaceHook = () => ()
    // The overwrite's state stands untouched by the aborted delete.
    assert(rows(t) == Seq((7, "q")))
  }

  test("CHECK constraints: every write verb enforces; survive checkpoint; droppable") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)            // v1
    val v2 = TxLog.addConstraint(spark, t, "k_positive", "k > 0")   // v2
    assert(v2 == 2L)
    assert(TxLog.snapshot(spark, t).constraints ==
      Map("k_positive" -> "k > 0"))
    // ADD CONSTRAINT validates EXISTING rows first (the Delta rule).
    intercept[TxLog.ConstraintViolation] {
      TxLog.addConstraint(spark, t, "k_big", "k > 100")
    }
    // Every write verb refuses a violating batch — whole commit, no rows.
    intercept[TxLog.ConstraintViolation] {
      TxLog.append(spark, Seq((-2, "x")).toDF("k", "v"), t)
    }
    intercept[TxLog.ConstraintViolation] {
      TxLog.merge(spark, Seq((-3, "y")).toDF("k", "v"), t, Seq("k"))
    }
    intercept[TxLog.ConstraintViolation] {
      TxLog.overwriteAll(spark, Seq((-4, "z")).toDF("k", "v"), t)
    }
    intercept[TxLog.ConstraintViolation] {
      TxLog.replaceWhere(spark,
        Seq((-5, "a")).toDF("k", "v"), t, $"v" === "a")
    }
    assert(rows(t) == Seq((1, "a")))
    // SQL CHECK semantics: NULL evaluations PASS (spell NOT NULL as
    // `k IS NOT NULL` when that is the intent).
    TxLog.append(spark,
      Seq((Some(5), "ok"), (None, "nullk")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).count() == 3L)
    // The constraint survives checkpoint + log retention (it rides the
    // checkpoint like the schema meta).
    val cp = TxLog.checkpoint(spark, t)
    TxLog.cleanupLog(spark, t, keepFrom = cp)
    intercept[TxLog.ConstraintViolation] {
      TxLog.append(spark, Seq((-9, "neg")).toDF("k", "v"), t)
    }
    // DROP lifts enforcement going forward.
    TxLog.dropConstraint(spark, t, "k_positive")
    TxLog.append(spark, Seq((-9, "neg")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).count() == 4L)
    assert(TxLog.snapshot(spark, t).constraints.isEmpty)
  }

  test("merge races: commutes past a concurrent append, aborts on rewrite") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    TxLog.append(spark, Seq((2, "b")).toDF("k", "v"), t)
    // A concurrent APPEND lands between the merge's snapshot and its
    // claim: none of the merge's targeted files were removed, so it
    // commutes.  The concurrently-appended key is NOT deduped — it was
    // not visible to this merge (the documented blind-append rule).
    TxLog.mergeRaceHook = () => {
      TxLog.mergeRaceHook = () => ()
      TxLog.append(spark, Seq((9, "late")).toDF("k", "v"), t): Unit
    }
    try {
      val v = TxLog.merge(spark, Seq((2, "B"), (3, "c")).toDF("k", "v"),
        t, keys = Seq("k"))
      assert(v == 4L) // append took 3, the merge re-claimed 4
    } finally TxLog.mergeRaceHook = () => ()
    assert(rows(t) == Seq((1, "a"), (2, "B"), (3, "c"), (9, "late")))
    // A concurrent commit that REMOVED a targeted file is a real
    // conflict: the merge aborts rather than resurrecting dropped rows.
    TxLog.mergeRaceHook = () => {
      TxLog.mergeRaceHook = () => ()
      TxLog.overwriteAll(spark, Seq((7, "q")).toDF("k", "v"), t): Unit
    }
    try {
      intercept[TxLog.ConcurrentRewrite] {
        TxLog.merge(spark, Seq((1, "A2")).toDF("k", "v"), t,
          keys = Seq("k"))
      }
    } finally TxLog.mergeRaceHook = () => ()
    assert(rows(t) == Seq((7, "q")))
  }

  test("appendsSince consumes only pure-append commits; pruned ranges fail loudly") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t) // v1
    TxLog.append(spark, Seq((3, "c")).toDF("k", "v"), t)           // v2
    TxLog.compact(spark, t)                                        // v3 rewrite
    TxLog.append(spark, Seq((4, "d")).toDF("k", "v"), t)           // v4
    // Everything appended after v1 = keys 3 and 4; the compaction's
    // adds re-describe existing rows and must NOT appear.
    val got = TxLog.readAppendsSince(spark, t, since = 1L)
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((3, "c"), (4, "d")))
    // Caught-up consumer reads nothing (empty frame, table schema).
    val empty = TxLog.readAppendsSince(spark, t, since = 4L)
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("k", "v"))
    // Log retention prunes commits 1..4; the surviving range still
    // serves, the pruned range fails loudly instead of skipping data.
    TxLog.checkpoint(spark, t)
    TxLog.cleanupLog(spark, t, keepFrom = 4L)
    TxLog.append(spark, Seq((5, "e")).toDF("k", "v"), t)           // v5
    assert(TxLog.readAppendsSince(spark, t, since = 4L)
      .as[(Int, String)].collect().toSeq == Seq((5, "e")))
    val e = intercept[IllegalArgumentException] {
      TxLog.appendsSince(spark, t, since = 1L)
    }
    assert(e.getMessage.contains("pruned"))
  }

  test("merge: update + insert + untouched-file carry in one commit") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)          // v1
    TxLog.append(spark, Seq((2, "b")).toDF("k", "v"), t)          // v2
    val untouched = TxLog.snapshot(spark, t, Some(1L)).files
    val v3 = TxLog.merge(spark,
      Seq((2, "B"), (3, "c")).toDF("k", "v"), t, keys = Seq("k"))
    assert(v3 == 3L)
    assert(rows(t) == Seq((1, "a"), (2, "B"), (3, "c")))
    // v1's file held no matched key: carried by reference, not rewritten.
    val live = TxLog.snapshot(spark, t).files.toSet
    assert(untouched.forall(live.contains))
    // Pre-merge snapshot unaffected (the update is a new version).
    assert(rows(t, Some(2L)) == Seq((1, "a"), (2, "b")))
    // A batch updating one key twice has no defined order: loud failure.
    val e = intercept[IllegalArgumentException] {
      TxLog.merge(spark, Seq((5, "x"), (5, "y")).toDF("k", "v"), t,
        keys = Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
    // Merge into an empty/new table is a plain insert.
    val t2 = tmp()
    TxLog.merge(spark, Seq((7, "q")).toDF("k", "v"), t2, keys = Seq("k"))
    assert(rows(t2) == Seq((7, "q")))
  }

  test("changesSince: per-commit multiset diffs; compaction is silent") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t) // v1
    TxLog.deleteWhere(spark, t, $"k" === 1)                        // v2
    TxLog.compact(spark, t)                                        // v3
    TxLog.merge(spark, Seq((2, "B"), (4, "d")).toDF("k", "v"), t,
      keys = Seq("k"))                                             // v4
    val all = TxLog.changesSince(spark, t, since = 0L)
      .as[(Int, String, String, Long)].collect().sortBy(r => (r._4, r._3, r._1))
    assert(all.toSeq == Seq(
      (1, "a", "insert", 1L), (2, "b", "insert", 1L),
      (1, "a", "delete", 2L),                    // deleteWhere: only the hit
      (2, "b", "delete", 4L),                    // merge update = delete+insert
      (2, "B", "insert", 4L), (4, "d", "insert", 4L)))
    // v3 (compact) emitted nothing: layout is not data.
    assert(!all.exists(_._4 == 3L))
    // Caught-up consumer: empty frame, data schema + the two CDF columns.
    val none = TxLog.changesSince(spark, t, since = 4L)
    assert(none.count() == 0)
    assert(none.schema.fieldNames.toSeq ==
      Seq("k", "v", "_change_type", "_commit_version"))
  }

  test("replaceWhere: atomic scoped delete+insert, idempotent, constraint loud") {
    val t = tmp()
    TxLog.append(spark,
      Seq((1, "keep"), (2, "old"), (3, "old")).toDF("k", "v"), t)   // v1
    // Replace the v='old' scope with fresh rows — one commit.
    val v2 = TxLog.replaceWhere(spark,
      Seq((2, "old"), (9, "old")).toDF("k", "v"), t, $"v" === "old")
    assert(v2 == 2L)
    assert(rows(t) == Seq((1, "keep"), (2, "old"), (9, "old")))
    // Re-running the same scoped reload converges to the same state.
    TxLog.replaceWhere(spark,
      Seq((2, "old"), (9, "old")).toDF("k", "v"), t, $"v" === "old")
    assert(rows(t) == Seq((1, "keep"), (2, "old"), (9, "old")))
    // Incoming rows OUTSIDE the scope would break idempotency: loud.
    val e = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark, Seq((5, "other")).toDF("k", "v"), t,
        $"v" === "old")
    }
    assert(e.getMessage.contains("satisfy the predicate"))
    // Empty incoming = pure scoped delete.
    TxLog.replaceWhere(spark,
      Seq.empty[(Int, String)].toDF("k", "v"), t, $"v" === "old")
    assert(rows(t) == Seq((1, "keep")))
  }

  test("compactSmall: bin-packs only the small-file tail, big files carry") {
    val t = tmp()
    // One "big" file (many rows) + a tail of small single-row appends.
    TxLog.append(spark,
      (1 to 500).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    val big = TxLog.snapshot(spark, t).files
    assert(big.size == 1)
    for (i <- 501 to 504)
      TxLog.append(spark, Seq((i, s"v$i")).toDF("k", "v").coalesce(1), t)
    val bigLen = {
      val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getFileStatus(new Path(t, big.head)).getLen
    }
    val v = TxLog.compactSmall(spark, t, thresholdBytes = bigLen)
    val after = TxLog.snapshot(spark, t)
    assert(v == after.version && v == 6L)
    // Big file carried by reference; four small files became one.
    assert(after.files.contains(big.head))
    assert(after.files.size == 2)
    // Content identical.
    assert(TxLog.read(spark, t).count() == 504L)
    assert(rows(t).take(3) == Seq((1, "v1"), (2, "v2"), (3, "v3")))
    // Idempotent: one packed file is not a tail worth churning.
    assert(TxLog.compactSmall(spark, t, thresholdBytes = bigLen) == v)
  }

  test("restoreTo: metadata-only rollback; vacuumed target fails loudly") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)           // v1
    TxLog.overwriteAll(spark, Seq((2, "b")).toDF("k", "v"), t)     // v2
    val v3 = TxLog.restoreTo(spark, t, version = 1L)
    assert(v3 == 3L && rows(t) == Seq((1, "a")))
    // The rolled-back version is still in history (restore is a commit).
    assert(rows(t, Some(2L)) == Seq((2, "b")))
    // After vacuum reclaims v2's file, restoring to it fails loudly.
    TxLog.vacuum(spark, t, keepFrom = 3L)
    val e = intercept[IllegalArgumentException] {
      TxLog.restoreTo(spark, t, version = 2L)
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("driver-gate query: replayed log equals the plain table") {
    val dir = "/root/testdata/sf0.001"
    val got = TxLog.revenueFromLog(spark, dir)
      .as[(String, Long, BigDecimal, java.sql.Date)]
      .collect().sortBy(_._1).toSeq
    import org.apache.spark.sql.functions._
    val want = graft.core.Sources.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(graft.core.Frag.sumMoney(
          graft.core.Frag.money("o_totalprice"))).as("receita"),
        max(to_date(col("o_orderdate"))).as("ultima"))
      .as[(String, Long, BigDecimal, java.sql.Date)]
      .collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("auto-checkpoint: every-N commits write a checkpoint without being asked") {
    val t = tmp()
    TxLog.autoCheckpointEvery = 3
    try {
      (1 to 4).foreach(i =>
        TxLog.append(spark, Seq((i, "v")).toDF("k", "v"), t))
      val cps = new java.io.File(t + "/_txlog").listFiles()
        .map(_.getName).filter(_.endsWith(".checkpoint.json")).toSeq
      assert(cps == Seq(f"${3L}%020d.checkpoint.json"))
      // Replay through the auto-checkpoint stays correct, and log
      // retention can lean on it.
      assert(rows(t).map(_._1) == Seq(1, 2, 3, 4))
      TxLog.cleanupLog(spark, t, keepFrom = 3L)
      assert(rows(t).map(_._1) == Seq(1, 2, 3, 4))
    } finally TxLog.autoCheckpointEvery = 100
  }

  test("a constraint registered mid-commit re-validates the staged batch (r9 ADVICE)") {
    val t = tmp()
    TxLog.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    // APPEND side: the batch was validated against a constraint-free
    // snapshot; a concurrent addConstraint lands before the publish
    // claim.  Without re-validation the violating rows would commit
    // into a table that now carries the constraint.
    TxLog.commitRaceHook = () => {
      TxLog.commitRaceHook = () => ()
      TxLog.addConstraint(spark, t, "k_positive", "k > 0"): Unit
    }
    try {
      intercept[TxLog.ConstraintViolation] {
        TxLog.append(spark, Seq((-2, "x")).toDF("k", "v"), t)
      }
    } finally TxLog.commitRaceHook = () => ()
    assert(rows(t) == Seq((1, "a")))
    TxLog.dropConstraint(spark, t, "k_positive")
    // MERGE side: same race through the merge retry loop.
    TxLog.mergeRaceHook = () => {
      TxLog.mergeRaceHook = () => ()
      TxLog.addConstraint(spark, t, "k_positive", "k > 0"): Unit
    }
    try {
      intercept[TxLog.ConstraintViolation] {
        TxLog.merge(spark, Seq((-3, "y")).toDF("k", "v"), t, Seq("k"))
      }
    } finally TxLog.mergeRaceHook = () => ()
    assert(rows(t) == Seq((1, "a")))
    TxLog.dropConstraint(spark, t, "k_positive")
    // ADD CONSTRAINT side (the symmetric race): violating data lands
    // between the full-table check and the registration claim — the
    // registration must fail, not silently leave the table in
    // violation of a registered constraint.
    TxLog.commitRaceHook = () => {
      TxLog.commitRaceHook = () => ()
      TxLog.append(spark, Seq((-7, "z")).toDF("k", "v"), t): Unit
    }
    try {
      intercept[TxLog.ConstraintViolation] {
        TxLog.addConstraint(spark, t, "k_positive", "k > 0")
      }
    } finally TxLog.commitRaceHook = () => ()
    assert(TxLog.snapshot(spark, t).constraints.isEmpty)
    assert(rows(t) == Seq((-7, "z"), (1, "a")))
  }

  test("stats pruning refuses narrowing casts: a BIGINT→INT wrap cannot skip a delete (r9 ADVICE)") {
    import org.apache.spark.sql.functions.expr
    withAnsi(false) {
      val t = tmp()
      // Every long value exceeds int range: CAST(k AS INT) WRAPS in
      // non-ANSI mode, so the cast is not monotone and the pruner must
      // keep the file (unwrapping it would compare the wrapped literal
      // against long-domain stats and prune a matching file).
      TxLog.append(spark,
        Seq((5000000000L, "big"), (6000000000L, "big2")).toDF("k", "v"), t)
      val wrapped = 5000000000L.toInt // 705032704
      val (_, kept) = TxLog.pruneFiles(spark, t,
        expr(s"CAST(k AS INT) = $wrapped"))
      assert(kept.nonEmpty)
      // End to end: the GDPR-style delete actually removes the row.
      TxLog.deleteWhere(spark, t, expr(s"CAST(k AS INT) = $wrapped"))
      assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq
        == Seq((6000000000L, "big2")))
      // Widening casts still prune: no remaining long equals 42.
      val (_, kept2) = TxLog.pruneFiles(spark, t,
        expr("CAST(k AS DECIMAL(38,0)) = 42"))
      assert(kept2.isEmpty)
      // And a widening match is still found (no over-pruning).
      val (_, kept3) = TxLog.pruneFiles(spark, t,
        expr("CAST(k AS DECIMAL(38,0)) = 6000000000"))
      assert(kept3.nonEmpty)
      // Zero-row rewrites are dropped from commits (an empty survivor
      // file would be stats-less and forever unprunable); a fully
      // emptied table reads as the empty frame under its schema.
      TxLog.deleteWhere(spark, t, expr("k = 6000000000"))
      assert(TxLog.snapshot(spark, t).files.isEmpty)
      assert(TxLog.read(spark, t).count() == 0L)
      assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("k", "v"))
    }
  }
}
