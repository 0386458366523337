package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal transactional commit-log table format — the "real answer"
  * this engine's own docs have been deferring to since the swap sinks
  * landed: [[Sinks.swapInto]]/[[Sinks.merge]]/[[Sinks.compact]] are
  * crash-safe only where directory RENAME is atomic (HDFS), and every
  * one of them carries the caveat that on S3-like stores rename is
  * copy+delete and "a table format's commit log" replaces it.  This is
  * that commit log, Delta/Iceberg's core idea reduced to what the
  * engine's sinks actually need (public design: Armbrust et al., "Delta
  * Lake: High-Performance ACID Table Storage over Cloud Object Stores",
  * VLDB 2020):
  *
  *   - Data files are immutable and written OUT of line under
  *     `<table>/data/<uuid>/`; they are invisible until a commit
  *     references them.  A crashed writer leaves orphan data files and
  *     an unchanged table — never a torn one.
  *   - The table state is the replay of `_txlog/<version>.json`
  *     commits, each a list of `add`/`remove` file actions
  *     (version = zero-padded monotonically increasing long).
  *   - A commit is published by `create(path, overwrite = false)` on
  *     the NEXT version number — one atomic claim, the Delta LogStore
  *     contract: HDFS gives real atomicity; the local FS used in tests
  *     approximates it (exists-check + create); true object stores need
  *     a CAS primitive (S3 conditional PUT) behind the same call.
  *     Losing the race throws [[TxLog.CommitConflict]]; blind appends
  *     simply re-read and retry, rewriters re-validate.
  *   - Readers resolve a SNAPSHOT (the live file set at a version) once
  *     and read only those files — concurrent commits never change what
  *     a running query sees (snapshot isolation), and old versions stay
  *     readable (time travel) until [[vacuum]] drops their files.
  *
  * Removed files are tombstoned in the log but deleted only by
  * [[vacuum]], which is what makes time travel + concurrent readers
  * safe: a reader of v1 keeps its files even after v2 overwrote them.
  *
  * At 100 TB the log itself stays tiny (one small JSON per commit; file
  * counts bounded by [[Sinks.compact]]-style rewrites committed here as
  * remove+add), and the O(versions) replay cost is bounded in practice
  * by checkpointing the snapshot every N commits — noted, not built:
  * the replay here is a driver-side metadata scan of at most a few
  * thousand small files, and the gate exercises double-digit versions.
  */
object TxLog {

  final class CommitConflict(version: Long, table: String)
    extends RuntimeException(
      s"TxLog: version $version of $table was claimed by a concurrent " +
        "writer; re-read the log and retry")

  final case class Snapshot(version: Long, files: Seq[String]) {
    def isEmpty: Boolean = files.isEmpty
  }

  private def logDir(table: Path) = new Path(table, "_txlog")
  private def commitPath(table: Path, v: Long) =
    new Path(logDir(table), f"$v%020d.json")
  private def checkpointPath(table: Path, v: Long) =
    new Path(logDir(table), f"$v%020d.checkpoint.json")

  private val CommitName = """^(\d{20})\.json$""".r
  private val CheckpointName = """^(\d{20})\.checkpoint\.json$""".r

  private def fsOf(spark: SparkSession, table: Path): FileSystem =
    table.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parse one commit file: JSON-lines, one `{"a":"add"|"remove",
    * "p":"<table-relative path>"}` action per line.  Hand-rolled
    * (de)serialization for exactly this shape — paths are UUID dir +
    * Spark part-file names, so the only escaping they need is none. */
  private def readCommit(fs: FileSystem, p: Path): Seq[(String, String)] = {
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val a = field(line, "a")
      val pth = field(line, "p")
      (a, pth)
    }.toSeq
  }

  private def field(json: String, key: String): String = {
    val tag = "\"" + key + "\":\""
    val i = json.indexOf(tag)
    require(i >= 0, s"TxLog: malformed commit line (no '$key'): $json")
    val start = i + tag.length
    json.substring(start, json.indexOf('"', start))
  }

  private def render(actions: Seq[(String, String)]): String =
    actions.map { case (a, p) => s"""{"a":"$a","p":"$p"}""" }
      .mkString("", "\n", "\n")

  /** Committed versions in ascending order (checkpoints excluded). */
  private def versions(fs: FileSystem, table: Path): Seq[Long] = {
    val dir = logDir(table)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case CommitName(v) => v.toLong }
      .sorted
  }

  /** Checkpointed versions in ascending order. */
  private def checkpointVersions(fs: FileSystem, table: Path): Seq[Long] = {
    val dir = logDir(table)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case CheckpointName(v) => v.toLong }
      .sorted
  }

  /** Resolve the live file set at `asOf` (default: latest).  Replay
    * starts from the newest CHECKPOINT at or below the target (a full
    * live-set listing written by [[checkpoint]]) and applies only the
    * commits after it — O(commits since checkpoint), not O(table
    * lifetime) — then add/remove actions apply in version order: remove
    * wins over an earlier add, exactly once.  With [[cleanupLog]] the
    * commits a checkpoint subsumes may be gone; versions older than the
    * oldest checkpoint are then pruned history and fail loudly. */
  def snapshot(spark: SparkSession, path: String,
      asOf: Option[Long] = None): Snapshot = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val vs = versions(fs, table)
    val cps = checkpointVersions(fs, table)
    val known = (vs ++ cps).sorted
    val upTo = asOf match {
      case Some(v) =>
        require(known.contains(v),
          s"TxLog: version $v of $path does not exist or was pruned " +
            s"(known: ${known.mkString(",")})")
        v
      case None => if (known.isEmpty) 0L else known.max
    }
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    val base = cps.filter(_ <= upTo).lastOption
    base.foreach { cv =>
      for ((a, p) <- readCommit(fs, checkpointPath(table, cv)))
        if (a == "add") live += p
    }
    val from = base.getOrElse(Long.MinValue)
    for (v <- vs if v > from && v <= upTo;
         (a, p) <- readCommit(fs, commitPath(table, v)))
      a match {
        case "add"    => live += p
        case "remove" => live -= p
        case "txn"    => () // writer-idempotence marker, no file effect
        case other =>
          throw new IllegalStateException(s"TxLog: unknown action '$other'")
      }
    Snapshot(upTo, live.toSeq)
  }

  /** Write a CHECKPOINT of the current live set at the latest version —
    * the O(versions)-replay bound the format's scaladoc promises: reads
    * resume from the newest checkpoint instead of replaying the whole
    * log, and [[cleanupLog]] may drop the commits it subsumes.
    * Idempotent per version; returns the checkpointed version. */
  def checkpoint(spark: SparkSession, path: String): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    require(snap.version > 0L, s"TxLog: nothing to checkpoint at $path")
    val target = checkpointPath(table, snap.version)
    if (fs.exists(target)) return snap.version
    val tmp = new Path(logDir(table),
      s".tmp-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(render(snap.files.map(("add", _))).getBytes("UTF-8"))
    finally out.close()
    if (!claim(fs, tmp, target)) fs.delete(tmp, true) // concurrent writer won
    snap.version
  }

  /** Log retention: delete commit files a checkpoint at or below
    * `keepFrom` subsumes.  Time travel below that checkpoint becomes
    * pruned history (reads fail loudly naming the known versions);
    * everything at or after it replays from the checkpoint.  No-op
    * (returns 0) when no checkpoint qualifies — the log is never left
    * unreadable.  The txn ledger older than the cut is pruned with it,
    * so streaming writers must checkpoint+cleanup only beyond their
    * replay horizon (same contract as Delta's logRetentionDuration). */
  def cleanupLog(spark: SparkSession, path: String, keepFrom: Long): Int = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val cut = checkpointVersions(fs, table).filter(_ <= keepFrom)
      .lastOption.getOrElse(return 0)
    var deleted = 0
    for (v <- versions(fs, table) if v <= cut)
      if (fs.delete(commitPath(table, v), false)) deleted += 1
    deleted
  }

  /** The commit history as a DataFrame — one row per surviving commit:
    * (version, n_add, n_remove, n_txn) plus whether a checkpoint exists
    * at that version.  The DESCRIBE HISTORY analog, driver-side
    * metadata only. */
  def history(spark: SparkSession, path: String): DataFrame = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val cps = checkpointVersions(fs, table).toSet
    val rows = versions(fs, table).map { v =>
      val actions = readCommit(fs, commitPath(table, v))
      (v, actions.count(_._1 == "add").toLong,
        actions.count(_._1 == "remove").toLong,
        actions.count(_._1 == "txn").toLong, cps.contains(v))
    }
    import spark.implicits._
    rows.toDF("version", "n_add", "n_remove", "n_txn", "checkpointed")
  }

  /** Read the table at a snapshot.  The file list is pinned BEFORE the
    * scan plans, so commits that land while the query runs are
    * invisible to it (snapshot isolation), and `asOf` time-travels.
    * An empty table reads as an empty frame only when the caller
    * supplies no schema hint — callers that need one read a live file's
    * footer; the registered query always has data. */
  def read(spark: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, path, asOf)
    require(snap.files.nonEmpty,
      s"TxLog: table $path has no live files at version ${snap.version}")
    spark.read.parquet(snap.files.map(f => s"$path/$f"): _*)
  }

  /** First-writer-wins claim of `target` by fully-written `tmp` — the
    * LogStore primitive.  HDFS: rename, atomic and false-if-exists.
    * Local FS: POSIX rename OVERWRITES an existing destination (a tight
    * race could lose a committed version), so the claim is an atomic
    * HARD LINK instead — `link(2)` fails with EEXIST if the target
    * appeared first.  Object stores need a CAS put behind this same
    * call. */
  private def claim(fs: FileSystem, tmp: Path, target: Path): Boolean =
    if (fs.getUri.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else fs.rename(tmp, target)

  /** Atomically claim `version`: create-no-overwrite on the commit
    * path.  The two-phase write (temp file + claim) keeps a half-written
    * commit from ever being parsed as version N: the content lands under
    * a dotted temp name (ignored by [[versions]]), and the CLAIM is the
    * single link/rename of the final name. */
  private def publish(fs: FileSystem, table: Path, version: Long,
      actions: Seq[(String, String)]): Unit = {
    val target = commitPath(table, version)
    if (fs.exists(target))
      throw new CommitConflict(version, table.toString)
    val tmp = new Path(logDir(table),
      s".tmp-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(render(actions).getBytes("UTF-8"))
    finally out.close()
    if (!claim(fs, tmp, target)) {
      fs.delete(tmp, true)
      throw new CommitConflict(version, table.toString)
    }
  }

  /** Write `df` as new immutable data files and commit them as an
    * APPEND.  Lost races retry automatically (an append commutes with
    * any concurrent commit).  Returns the committed version. */
  def append(spark: SparkSession, df: DataFrame, path: String): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val adds = writeData(spark, df, table, fs)
    commitWithRetry(spark, fs, table, _ => adds.map(("add", _)))
  }

  /** Replace the whole table content with `df` in one commit
    * (remove every live file + add the new ones) — [[Sinks.overwriteAll]]
    * with readers never seeing a middle state, on ANY store.  On a lost
    * race the removes are recomputed against the new latest snapshot. */
  def overwriteAll(spark: SparkSession, df: DataFrame, path: String): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val adds = writeData(spark, df, table, fs)
    commitWithRetry(spark, fs, table, snap =>
      snap.files.map(("remove", _)) ++ adds.map(("add", _)))
  }

  /** Rewrite the live files into `files` compacted ones and commit the
    * swap as remove+add.  Unlike [[Sinks.compact]]'s rename chain this
    * needs NO crash-window reasoning: either the commit exists (new
    * layout) or it doesn't (old layout) — and a reader of the old
    * version keeps working either way.  If a concurrent commit touched
    * the table between the snapshot and the claim, the rewrite is
    * ABANDONED (its files become orphans for [[vacuum]]) rather than
    * committing a stale file set — the optimistic-concurrency rule a
    * rewriter must follow where an appender may retry. */
  def compact(spark: SparkSession, path: String, files: Int = 1): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    require(snap.files.nonEmpty, s"TxLog: nothing to compact at $path")
    val df = spark.read.parquet(snap.files.map(f => s"$path/$f"): _*)
      .repartition(files)
    val adds = writeData(spark, df, table, fs)
    val actions = snap.files.map(("remove", _)) ++ adds.map(("add", _))
    publish(fs, table, snap.version + 1, actions) // no retry: see scaladoc
    snap.version + 1
  }

  /** Row-level DELETE WHERE over the commit log — the file-granular
    * GDPR/tombstone delete [[Sinks.eraseKeys]] can only do at PARTITION
    * granularity: find the files that contain a matching row
    * (`input_file_name` over the live snapshot — at scale the predicate
    * pushes into this scan, so non-matching files are skipped at the
    * row-group level), rewrite ONLY those files without the matching
    * rows, and commit remove(affected)+add(rewrites) atomically.
    * Untouched files are carried by reference — their bytes are never
    * read or rewritten (spec-asserted on the file list), which at 100 TB
    * is the difference between a deletion batch costing O(affected
    * files) and O(table).  Like [[compact]], a concurrent commit between
    * snapshot and claim aborts the rewrite (orphans for [[vacuum]])
    * rather than committing against a stale file set.  Pre-delete
    * versions stay readable until vacuum — which is also the audit
    * trail.  Returns the committed version (unchanged if nothing
    * matched). */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    if (snap.files.isEmpty) return snap.version
    val withFile = spark.read.parquet(snap.files.map(f => s"$path/$f"): _*)
      .withColumn("_graft_file", input_file_name())
    // Raw URI strings exactly as input_file_name renders them — the
    // survivors filter compares against these verbatim; the commit's
    // remove actions use the table-relative form.
    val affectedRaw = withFile.filter(predicate)
      .select(col("_graft_file")).distinct()
      .collect().map(_.getString(0))
    if (affectedRaw.isEmpty) return snap.version
    val affectedRel = affectedRaw
      .map(u => relativize(table, new Path(new java.net.URI(u))))
      .toSeq.sorted
    // Survivors re-plan over ONLY the affected files (untouched files'
    // bytes are never opened for the rewrite).  SQL DELETE semantics:
    // only predicate=TRUE rows are deleted, so NULL-predicate rows
    // survive — hence the coalesce.
    val survivors = spark.read
      .parquet(affectedRel.map(f => s"$path/$f"): _*)
      .filter(!org.apache.spark.sql.functions.coalesce(predicate,
        org.apache.spark.sql.functions.lit(false)))
    val adds = writeData(spark, survivors, table, fs)
    val actions = affectedRel.map(("remove", _)) ++ adds.map(("add", _))
    publish(fs, table, snap.version + 1, actions)
    snap.version + 1
  }

  /** Delete data files no snapshot at or after `keepFrom` references —
    * the storage-reclaim half of the tombstone design.  Time travel to
    * versions whose files were vacuumed fails loudly at read time (the
    * files are gone), which is the documented Delta behavior too.
    * Returns the deleted count. */
  def vacuum(spark: SparkSession, path: String, keepFrom: Long): Int = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val vs = (versions(fs, table) ++ checkpointVersions(fs, table))
      .distinct.sorted
    val keepVersions = vs.filter(_ >= keepFrom)
    val reachable = keepVersions
      .flatMap(v => snapshot(spark, path, Some(v)).files).toSet
    val dataRoot = new Path(table, "data")
    if (!fs.exists(dataRoot)) return 0
    var deleted = 0
    val it = fs.listFiles(dataRoot, true)
    val doomed = Seq.newBuilder[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val rel = relativize(table, f.getPath)
        if (!reachable.contains(rel)) doomed += f.getPath
      }
    }
    doomed.result().foreach { p =>
      if (fs.delete(p, false)) deleted += 1
    }
    deleted
  }

  private def relativize(table: Path, file: Path): String = {
    val t = table.toUri.getPath
    val f = file.toUri.getPath
    require(f.startsWith(t + "/"), s"TxLog: $file outside $table")
    f.substring(t.length + 1)
  }

  /** Stage `df` under `data/<uuid>/` and return the table-relative
    * parquet paths.  Nothing here is visible to readers. */
  private def writeData(spark: SparkSession, df: DataFrame, table: Path,
      fs: FileSystem): Seq[String] = {
    val dir = new Path(new Path(table, "data"),
      java.util.UUID.randomUUID().toString)
    df.write.mode("error").parquet(dir.toString)
    val it = fs.listFiles(dir, false)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        out += relativize(table, f.getPath)
    }
    val files = out.result()
    require(files.nonEmpty || df.isEmpty,
      s"TxLog: staged write produced no data files under $dir")
    files
  }

  /** Highest batch id committed under `appId`, read from the `txn`
    * markers — the writer-idempotence ledger of [[appendBatch]]. */
  def lastCommittedBatch(spark: SparkSession, path: String,
      appId: String): Option[Long] = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val ids = for {
      v <- versions(fs, table)
      (a, p) <- readCommit(fs, commitPath(table, v))
      if a == "txn"
      i = p.lastIndexOf(':')
      if i > 0 && p.substring(0, i) == appId
    } yield p.substring(i + 1).toLong
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Exactly-once micro-batch append: the batch's data files and a
    * `txn` marker `appId:batchId` land in ONE atomic commit, so a
    * replayed batch (restart after the sink committed but before the
    * checkpoint advanced — the classic at-least-once window of
    * `foreachBatch`) is recognized by [[lastCommittedBatch]] and
    * SKIPPED instead of appended twice.  This is the published Delta
    * streaming-sink transaction design (txnAppId/txnVersion).  Returns
    * whether the batch was committed (false = already in the table).
    * `appId` must not contain a newline or '"'; batch ids must be
    * monotone per appId (Structured Streaming guarantees both). */
  def appendBatch(spark: SparkSession, df: DataFrame, path: String,
      appId: String, batchId: Long): Boolean = {
    if (lastCommittedBatch(spark, path, appId).exists(_ >= batchId))
      return false
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val adds = writeData(spark, df, table, fs)
    commitWithRetry(spark, fs, table, _ =>
      ("txn", s"$appId:$batchId") +: adds.map(("add", _)))
    true
  }

  /** Structured-Streaming append sink over the commit log — the
    * exactly-once landing the parquet rename sinks can only approximate:
    * `foreachBatch` → [[appendBatch]], one atomic commit per
    * micro-batch, replays de-duplicated by the txn ledger.  Readers see
    * whole batches or nothing, on any store with an atomic
    * create/CAS primitive. */
  def writeStreamAppend(stream: DataFrame, path: String,
      checkpoint: String, appId: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          appendBatch(batch.sparkSession, batch.toDF(), path, appId,
            batchId)
          ()
      }
      .start()

  /** Driver-gate query: orders loaded through a REAL multi-version log
    * history — append the even keys (v1), append the odd keys (v2),
    * compact the layout (v3: remove+add) — then read the LATEST snapshot
    * and aggregate.  A hash match against the plain-orders oracle proves
    * the whole replay chain: both appends visible, the compaction's
    * removes dropped exactly the superseded files, no row lost or
    * doubled across the rewrite.  Staged once per (JVM, dir, source
    * fingerprint) via [[Staging]]. */
  /** Shared gate staging: orders loaded as append(even keys) →
    * append(odd keys) → compact, once per (JVM, dir, fingerprint). */
  private def stagedLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog#$dir", fp) { base =>
      val t = s"$base/orders_txlog"
      val o = Sources.orders(spark, dir)
      append(spark, o.filter(col("o_orderkey") % 2 === 0), t)
      append(spark, o.filter(col("o_orderkey") % 2 =!= 0), t)
      if (snapshot(spark, t).files.nonEmpty) compact(spark, t, files = 4)
    } + "/orders_txlog"
  }

  def revenueFromLog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      // Degenerate source: keep the schema contract without a scan.
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS DECIMAL(18,2)) AS receita",
        "CAST(NULL AS DATE) AS ultima")
    read(spark, t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"),
        max(to_date(col("o_orderdate"))).as("ultima"))
  }

  val revenueFromLogOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  MAX(CAST(o_orderdate AS DATE)) AS ultima
       |FROM orders GROUP BY 1""".stripMargin

  /** Driver-gate time travel: the same staged log read AS OF version 2 —
    * after both appends, BEFORE the compaction rewrote the layout.  The
    * content at v2 is the full table, so the same plain-orders oracle
    * applies; a hash match proves historical snapshot resolution
    * reconstructs exactly the pre-rewrite file set (keyed differently
    * from [[revenueFromLog]] so the two queries aren't plan-identical). */
  def revenueAsOf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedLog(spark, dir)
    val snap = snapshot(spark, t)
    if (snap.version < 2L || snapshot(spark, t, Some(2L)).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderpriority",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS DECIMAL(18,2)) AS receita")
    read(spark, t, asOf = Some(2L))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  val revenueAsOfOracle: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders GROUP BY 1""".stripMargin

  /** Claim latest+1 with `actions(latestSnapshot)`; on a conflict,
    * re-snapshot and retry (bounded — a pathological livelock fails
    * loudly instead of spinning forever). */
  private def commitWithRetry(spark: SparkSession, fs: FileSystem,
      table: Path, actions: Snapshot => Seq[(String, String)]): Long = {
    var attempts = 0
    while (true) {
      attempts += 1
      val snap = snapshot(spark, table.toString)
      val v = snap.version + 1
      try {
        publish(fs, table, v, actions(snap))
        return v
      } catch {
        case _: CommitConflict if attempts < 50 => // re-read and retry
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
