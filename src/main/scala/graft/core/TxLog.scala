package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

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
  *     commits, each a list of `add`/`remove` file actions plus an
  *     optional `meta` schema action
  *     (version = zero-padded monotonically increasing long).
  *   - A commit is published by `create(path, overwrite = false)` on
  *     the NEXT version number — one atomic claim, the Delta LogStore
  *     contract: HDFS gives real atomicity via rename; the local FS
  *     claims via atomic hard link; true object stores need a CAS
  *     primitive (S3 conditional PUT) behind the same call.  That
  *     conditional create is the ONLY atomic primitive the log needs:
  *     TxLogSpec runs the crash-window suite on a store whose rename
  *     THROWS on every log path (graft.NoRenameFileSystem) and stays
  *     green — nothing in the protocol is rename-atomic.
  *     Losing the race throws [[TxLog.CommitConflict]]; blind appends
  *     simply re-read and retry, rewriters re-validate.
  *   - Readers resolve a SNAPSHOT (the live file set at a version) once
  *     and read only those files — concurrent commits never change what
  *     a running query sees (snapshot isolation), and old versions stay
  *     readable (time travel) until [[vacuum]] drops their files.
  *
  * Beyond the r9 core, the format carries the two per-file metadata
  * features that make it credible at 100 TB:
  *
  *   - '''Data skipping''': every `add` action records min/max column
  *     statistics for the eligible columns of its file (integral,
  *     decimal, date, timestamp — double/float excluded for NaN-ordering
  *     safety, strings excluded to dodge the truncated-prefix upper-bound
  *     trap Delta documents).  [[readWhere]] prunes files whose stats
  *     PROVE the predicate can't match before the scan plans — at scale
  *     the difference between opening O(matching files) and O(table).
  *     Pruning is conservative: any predicate shape the little evaluator
  *     doesn't understand keeps the file, and [[readWhere]] re-applies
  *     the full predicate after the scan, so skipping is a pure
  *     optimization with zero semantic surface.
  *   - '''Schema evolution''': each commit may carry a `meta` action
  *     with the table schema as of that commit; appends widen the schema
  *     (new columns allowed, type changes rejected loudly), and readers
  *     apply the snapshot's schema so files written before a column
  *     existed read as NULL — by-name parquet resolution, the documented
  *     Delta/Iceberg behavior.  Time travel reads the schema AS OF the
  *     requested version.
  *
  * Removed files are tombstoned in the log but deleted only by
  * [[vacuum]], which is what makes time travel + concurrent readers
  * safe: a reader of v1 keeps its files even after v2 overwrote them.
  *
  * At 100 TB the log itself stays tiny (one small JSON per commit; file
  * counts bounded by [[Sinks.compact]]-style rewrites committed here as
  * remove+add), and the O(versions) replay cost is bounded in practice
  * by checkpointing the snapshot every N commits via [[checkpoint]].
  * Stats here are computed with one aggregation pass over the freshly
  * staged files (O(new data), amortized into the write); a
  * footer-only variant reading the parquet column-chunk statistics
  * would avoid even that scan and plugs in behind the same encoding.
  */
object TxLog {

  final class CommitConflict(version: Long, table: String)
    extends RuntimeException(
      s"TxLog: version $version of $table was claimed by a concurrent " +
        "writer; re-read the log and retry")

  /** A rewriter (deleteWhere) lost a race it cannot commute past: a
    * concurrent commit removed one of the files it planned to rewrite. */
  final class ConcurrentRewrite(table: String, files: Seq[String])
    extends RuntimeException(
      s"TxLog: concurrent commit removed files this rewrite targeted " +
        s"(${files.mkString(", ")}) at $table; re-run the operation")

  /** One commit-log action: `a` ∈ add|remove|txn|meta, `p` the payload
    * (table-relative path for add/remove, `appId:batchId` for txn,
    * URL-encoded schema JSON for meta), `s` the add action's encoded
    * file statistics ("" = none recorded). */
  private final case class Act(a: String, p: String, s: String = "")

  final case class Snapshot(version: Long, files: Seq[String],
      stats: Map[String, String] = Map.empty,
      schemaJson: Option[String] = None,
      constraints: Map[String, String] = Map.empty) {
    def isEmpty: Boolean = files.isEmpty
    def schema: Option[StructType] =
      schemaJson.map(j => DataType.fromJson(j).asInstanceOf[StructType])
  }

  /** A write landed rows that violate a registered CHECK constraint.
    * The staged files are orphans for [[vacuum]]; nothing committed. */
  final class ConstraintViolation(table: String, name: String,
      expr: String, row: String)
    extends RuntimeException(
      s"TxLog: CHECK constraint '$name' ($expr) violated at $table — " +
        s"offending row: $row")

  private def logDir(table: Path) = new Path(table, "_txlog")
  private def commitPath(table: Path, v: Long) =
    new Path(logDir(table), f"$v%020d.json")
  private def checkpointPath(table: Path, v: Long) =
    new Path(logDir(table), f"$v%020d.checkpoint.json")

  private val CommitName = """^(\d{20})\.json$""".r
  private val CheckpointName = """^(\d{20})\.checkpoint\.json$""".r

  private def fsOf(spark: SparkSession, table: Path): FileSystem =
    table.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parse one commit file: JSON-lines, one `{"a":..,"p":..[,"s":..]}`
    * action per line.  Hand-rolled (de)serialization for exactly this
    * shape — paths are UUID dir + Spark part-file names, and every
    * free-form payload (schema JSON, stat values) is URL-encoded before
    * it lands in a field, so the only escaping needed is none. */
  private def readCommit(fs: FileSystem, p: Path): Seq[Act] = {
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      Act(field(line, "a"), field(line, "p"),
        fieldOpt(line, "s").getOrElse(""))
    }.toSeq
  }

  private def field(json: String, key: String): String =
    fieldOpt(json, key).getOrElse(
      throw new IllegalArgumentException(
        s"TxLog: malformed commit line (no '$key'): $json"))

  private def fieldOpt(json: String, key: String): Option[String] = {
    val tag = "\"" + key + "\":\""
    val i = json.indexOf(tag)
    if (i < 0) return None
    val start = i + tag.length
    Some(json.substring(start, json.indexOf('"', start)))
  }

  private def render(actions: Seq[Act]): String =
    actions.map {
      case Act(a, p, "") => s"""{"a":"$a","p":"$p"}"""
      case Act(a, p, s)  => s"""{"a":"$a","p":"$p","s":"$s"}"""
    }.mkString("", "\n", "\n")

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
    * wins over an earlier add, exactly once.  Per-file stats ride the
    * add actions; the schema is the newest `meta` action at or below
    * the target.  With [[cleanupLog]] the commits a checkpoint subsumes
    * may be gone; versions older than the oldest checkpoint are then
    * pruned history and fail loudly. */
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
    val live = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var schemaJson: Option[String] = None
    val checks = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def apply(act: Act): Unit = act match {
      case Act("add", p, s)    => live += (p -> s)
      case Act("remove", p, _) => live -= p
      case Act("txn", _, _)    => () // writer-idempotence marker
      case Act("meta", p, _)   =>
        schemaJson = Some(java.net.URLDecoder.decode(p, "UTF-8"))
      case Act("constraint", p, _) =>
        val decoded = java.net.URLDecoder.decode(p, "UTF-8")
        val i = decoded.indexOf(':') // names are [A-Za-z0-9_]+, ':' is safe
        checks += (decoded.substring(0, i) -> decoded.substring(i + 1))
      case Act("dropconstraint", p, _) => checks -= p
      case Act(other, _, _) =>
        throw new IllegalStateException(s"TxLog: unknown action '$other'")
    }
    val base = cps.filter(_ <= upTo).lastOption
    base.foreach { cv =>
      readCommit(fs, checkpointPath(table, cv)).foreach(apply)
    }
    val from = base.getOrElse(Long.MinValue)
    for (v <- vs if v > from && v <= upTo)
      readCommit(fs, commitPath(table, v)).foreach(apply)
    Snapshot(upTo, live.keys.toSeq,
      live.toMap.filter(_._2.nonEmpty), schemaJson, checks.toMap)
  }

  /** Write a CHECKPOINT of the current live set at the latest version —
    * the O(versions)-replay bound the format's scaladoc promises: reads
    * resume from the newest checkpoint instead of replaying the whole
    * log, and [[cleanupLog]] may drop the commits it subsumes.  The
    * checkpoint carries the schema `meta` and every add's stats, so
    * resumed replays lose neither skipping nor evolution.
    * Idempotent per version; returns the checkpointed version. */
  def checkpoint(spark: SparkSession, path: String): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    require(snap.version > 0L, s"TxLog: nothing to checkpoint at $path")
    val target = checkpointPath(table, snap.version)
    if (fs.exists(target)) return snap.version
    val metaActs = snap.schemaJson.toSeq.map(j =>
      Act("meta", java.net.URLEncoder.encode(j, "UTF-8"))) ++
      snap.constraints.toSeq.sortBy(_._1).map { case (n, e) =>
        Act("constraint", java.net.URLEncoder.encode(s"$n:$e", "UTF-8"))
      }
    val addActs = snap.files.map(f =>
      Act("add", f, snap.stats.getOrElse(f, "")))
    val tmp = new Path(logDir(table),
      s".tmp-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(render(metaActs ++ addActs).getBytes("UTF-8"))
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
      (v, actions.count(_.a == "add").toLong,
        actions.count(_.a == "remove").toLong,
        actions.count(_.a == "txn").toLong, cps.contains(v))
    }
    import spark.implicits._
    rows.toDF("version", "n_add", "n_remove", "n_txn", "checkpointed")
  }

  /** Read the table at a snapshot.  The file list is pinned BEFORE the
    * scan plans, so commits that land while the query runs are
    * invisible to it (snapshot isolation), and `asOf` time-travels.
    * The snapshot's schema (if recorded) is applied to the scan:
    * files written before a column was added read it as NULL, and a
    * time-traveled read sees the schema as of that version. */
  def read(spark: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, path, asOf)
    // A table whose every row was deleted has NO live files (zero-row
    // rewrites are dropped from commits) but still has a schema — read
    // it as the empty frame, not an error.
    if (snap.files.isEmpty && snap.schema.isDefined)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), snap.schema.get)
    readFiles(spark, path, snap, snap.files)
  }

  /** Read the table with `predicate`, skipping every live file whose
    * min/max statistics prove it can contain no matching row.  The
    * predicate is re-applied to the scanned rows, so the result is
    * byte-identical to `read(...).filter(predicate)` whatever the
    * pruner understood — skipping only changes which files open. */
  def readWhere(spark: SparkSession, path: String, predicate: Column,
      asOf: Option[Long] = None): DataFrame = {
    val (snap, kept) = pruneFiles(spark, path, predicate, asOf)
    if (kept.isEmpty) {
      val schema = snap.schema.getOrElse(
        spark.read.parquet(snap.files.map(f => s"$path/$f"): _*).schema)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    }
    readFiles(spark, path, snap, kept).filter(predicate)
  }

  /** The skipping decision itself, exposed for audit/tests: the
    * snapshot plus the subset of its files whose stats admit a match.
    * The predicate's Catalyst tree is recovered from the ANALYZED plan
    * of a zero-row frame with the table schema — public API only; the
    * analyzer turns the Column DSL's UnresolvedFunction nodes into the
    * real comparison expressions, and the literal-widening casts it
    * inserts are folded by the pruner ([[TxStats.mayMatch]]). */
  def pruneFiles(spark: SparkSession, path: String, predicate: Column,
      asOf: Option[Long] = None): (Snapshot, Seq[String]) =
    pruneFilesIn(spark, path, predicate, snapshot(spark, path, asOf))

  /** [[pruneFiles]] against an ALREADY-RESOLVED snapshot — the form
    * [[deleteWhere]]/[[replaceWhere]] must use, so candidate discovery,
    * survivor rewrite, and the commit's remove set all read ONE
    * version.  (With an internal fresh snapshot, a commit landing
    * between the verb's snapshot and the prune could surface a file the
    * verb then rewrites and deletes rows from, contradicting the
    * documented 'concurrently-appended rows are not covered' rule.) */
  def pruneFilesIn(spark: SparkSession, path: String, predicate: Column,
      snap: Snapshot): (Snapshot, Seq[String]) = {
    if (snap.files.isEmpty) return (snap, Nil)
    val schema = snap.schema.getOrElse(
      spark.read.parquet(snap.files.map(f => s"$path/$f"): _*).schema)
    val dummy = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)
    val cond = dummy.filter(predicate).queryExecution.analyzed
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
    val kept = cond match {
      case None => snap.files
      case Some(expr) => snap.files.filter { f =>
        TxStats.mayMatch(expr,
          TxStats.parse(snap.stats.getOrElse(f, "")))
      }
    }
    (snap, kept)
  }

  private def readFiles(spark: SparkSession, path: String, snap: Snapshot,
      files: Seq[String]): DataFrame = {
    require(files.nonEmpty,
      s"TxLog: table $path has no live files at version ${snap.version}")
    val reader = snap.schema match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    reader.parquet(files.map(f => s"$path/$f"): _*)
  }

  /** Schemes whose claim runs through the rename-free hard-link path —
    * local path-backed stores.  TxLogSpec registers its `norename://`
    * shim (a filesystem whose rename THROWS on any log path) here to
    * prove the commit protocol needs nothing rename-atomic: the only
    * atomicity the log consumes is conditional-create (r10 verdict #4).
    * An object store plugs a CAS put (e.g. a conditional PUT) into the
    * same seam. */
  private[graft] val linkClaimSchemes: java.util.Set[String] = {
    val s = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    s.add("file"); s
  }

  /** First-writer-wins claim of `target` by fully-written `tmp` — the
    * LogStore primitive.  HDFS: rename, atomic and false-if-exists.
    * Local FS: POSIX rename OVERWRITES an existing destination (a tight
    * race could lose a committed version), so the claim is an atomic
    * HARD LINK instead — `link(2)` fails with EEXIST if the target
    * appeared first: a CONDITIONAL CREATE of the full content, no
    * rename anywhere.  Object stores need a CAS put behind this same
    * call. */
  private def claim(fs: FileSystem, tmp: Path, target: Path): Boolean =
    if (linkClaimSchemes.contains(fs.getUri.getScheme)) {
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
      actions: Seq[Act]): Unit = {
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

  /** Widen `current` with `incoming`: existing fields keep their slot
    * and type, brand-new fields append.  Every recorded field is
    * nullable — a file written before a column existed reads it as
    * NULL, so the TABLE-level contract for any column is nullable
    * regardless of what one append's frame claimed.  A same-name type
    * change is rejected loudly — silent coercion is how a table format
    * corrupts data. */
  private def mergeSchemas(current: Option[StructType],
      incoming: StructType, table: String): StructType = {
    val inc = StructType(incoming.fields.map(_.copy(nullable = true)))
    current match {
      case None => inc
      case Some(cur) =>
        val curNames = cur.fieldNames.toSet
        inc.fields.filter(f => curNames.contains(f.name)).foreach { f =>
          val old = cur(f.name)
          require(old.dataType == f.dataType,
            s"TxLog: schema conflict on '${f.name}' at $table: table has " +
              s"${old.dataType.simpleString}, append has " +
              s"${f.dataType.simpleString} (type changes are not evolution)")
        }
        StructType(cur.fields ++
          inc.fields.filterNot(f => curNames.contains(f.name)))
    }
  }

  /** Schema `meta` action for this commit if the table schema changes
    * with it (first commit always records one). */
  private def metaAction(snap: Snapshot, incoming: StructType,
      table: Path): Seq[Act] = {
    val merged = mergeSchemas(snap.schema, incoming, table.toString)
    if (snap.schema.contains(merged)) Nil
    else Seq(Act("meta",
      java.net.URLEncoder.encode(merged.json, "UTF-8")))
  }

  /** Register a CHECK constraint on the table — the Delta table-
    * constraint feature: every subsequent write verb ([[append]],
    * [[appendBatch]], [[merge]], [[replaceKeys]], [[replaceWhere]],
    * [[overwriteAll]]) validates its INCOMING rows and refuses the
    * whole commit ([[ConstraintViolation]]) if any row evaluates the
    * expression to FALSE (SQL CHECK semantics: NULL passes — spell
    * NOT-NULL as `x IS NOT NULL`).  The quality gate a shared table
    * needs at 100 TB: enforced at the storage layer, every writer, not
    * per-pipeline convention.  Existing rows must already satisfy the
    * constraint (checked now, loudly — Delta's ADD CONSTRAINT rule).
    * The registration is itself a commit, so it is ordered against
    * writers, survives [[checkpoint]]+[[cleanupLog]], and time travel
    * sees the constraints as of that version.  `name` must be
    * `[A-Za-z0-9_]+`; `expr` is a Spark SQL boolean expression over the
    * table columns. */
  def addConstraint(spark: SparkSession, path: String, name: String,
      expr: String): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, not, expr => e}
    require(name.matches("[A-Za-z0-9_]+"),
      s"TxLog: constraint name '$name' must be [A-Za-z0-9_]+")
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    def check(files: Seq[String], readSnap: Snapshot): Unit =
      if (files.nonEmpty) {
        val bad = readFiles(spark, path, readSnap, files)
          .filter(coalesce(not(e(expr)), lit(false))).limit(1).collect()
        if (bad.nonEmpty)
          throw new ConstraintViolation(path, name, expr, bad.head.toString)
      }
    check(snap.files, snap)
    val checked = snap.files.toSet
    commitWithRetry(spark, fs, table, _ => Seq(
      Act("constraint",
        java.net.URLEncoder.encode(s"$name:$expr", "UTF-8"))),
      // The symmetric race to the writer-side re-validation: data
      // committed between the full-table check and this publish must
      // also satisfy the constraint — check just the delta files.
      fresh => check(fresh.files.filterNot(checked), fresh))
  }

  /** Remove a CHECK constraint (a commit; history keeps the old one). */
  def dropConstraint(spark: SparkSession, path: String,
      name: String): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    commitWithRetry(spark, fs, table, _ =>
      Seq(Act("dropconstraint", name)))
  }

  /** Validate freshly-staged files against the table's CHECK
    * constraints, reading them under `readSchema` (for evolving writes,
    * the MERGED table schema — a constraint over a column the batch
    * omits sees NULL and passes, the SQL CHECK rule; an [[overwriteAll]]
    * reads under the NEW schema, so a constraint over a dropped column
    * fails analysis loudly — drop the constraint first).  Throws
    * [[ConstraintViolation]] naming the constraint and an offending
    * row; the staged files become [[vacuum]] orphans. */
  private def validateStaged(spark: SparkSession,
      constraints: Map[String, String], adds: Seq[(String, String)],
      readSchema: StructType, path: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not, expr => e}
    if (constraints.isEmpty || adds.isEmpty) return
    val df = spark.read.schema(readSchema)
      .parquet(adds.map { case (p, _) => s"$path/$p" }: _*)
    constraints.toSeq.sortBy(_._1).foreach { case (name, ex) =>
      val bad = df.filter(coalesce(not(e(ex)), lit(false)))
        .limit(1).collect()
      if (bad.nonEmpty)
        throw new ConstraintViolation(path, name, ex, bad.head.toString)
    }
  }

  /** Write `df` as new immutable data files and commit them as an
    * APPEND, widening the table schema if `df` carries new columns.
    * Lost races retry automatically (an append commutes with any
    * concurrent commit).  Returns the committed version. */
  def append(spark: SparkSession, df: DataFrame, path: String): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val adds = writeData(spark, df, table, fs)
    val snap = snapshot(spark, path)
    validateStaged(spark, snap.constraints, adds,
      mergeSchemas(snap.schema, df.schema, path), path)
    commitWithRetry(spark, fs, table, snap =>
      metaAction(snap, df.schema, table) ++
        adds.map { case (p, s) => Act("add", p, s) },
      revalidateIfMetaChanged(spark, snap, adds, df.schema, path))
  }

  /** Replace the whole table content with `df` in one commit
    * (remove every live file + add the new ones) — [[Sinks.overwriteAll]]
    * with readers never seeing a middle state, on ANY store.  The table
    * schema RESETS to `df`'s (an overwrite is a new table generation).
    * On a lost race the removes are recomputed against the new latest
    * snapshot. */
  def overwriteAll(spark: SparkSession, df: DataFrame, path: String): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val adds = writeData(spark, df, table, fs)
    val pre = snapshot(spark, path)
    validateStaged(spark, pre.constraints, adds,
      mergeSchemas(None, df.schema, path), path)
    val meta = Act("meta", java.net.URLEncoder.encode(
      mergeSchemas(None, df.schema, path).json, "UTF-8"))
    commitWithRetry(spark, fs, table, snap =>
      meta +: (snap.files.map(Act("remove", _)) ++
        adds.map { case (p, s) => Act("add", p, s) }),
      // Overwrite resets the schema to df's, so only a concurrently
      // REGISTERED constraint needs a re-check of the staged files.
      fresh =>
        if (fresh.constraints != pre.constraints)
          validateStaged(spark, fresh.constraints, adds,
            mergeSchemas(None, df.schema, path), path))
  }

  /** Rewrite the live files into `files` compacted ones and commit the
    * swap as remove+add.  Unlike [[Sinks.compact]]'s rename chain this
    * needs NO crash-window reasoning: either the commit exists (new
    * layout) or it doesn't (old layout) — and a reader of the old
    * version keeps working either way.  If a concurrent commit touched
    * the table between the snapshot and the claim, the rewrite is
    * ABANDONED (its files become orphans for [[vacuum]]) rather than
    * committing a stale file set — the optimistic-concurrency rule a
    * full-layout rewriter must follow where an appender may retry. */
  def compact(spark: SparkSession, path: String, files: Int = 1): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    require(snap.files.nonEmpty, s"TxLog: nothing to compact at $path")
    val df = readFiles(spark, path, snap, snap.files).repartition(files)
    val adds = writeData(spark, df, table, fs)
    val actions = snap.files.map(Act("remove", _)) ++
      adds.map { case (p, s) => Act("add", p, s) }
    publish(fs, table, snap.version + 1, actions) // no retry: see scaladoc
    snap.version + 1
  }

  /** INCREMENTAL OPTIMIZE: rewrite only the live files SMALLER than
    * `thresholdBytes` into one compacted file, leaving every
    * already-large file untouched (carried by reference) — the
    * bin-packing small-file compaction of Delta's OPTIMIZE, where
    * [[compact]] is the full-layout rewrite.  This is the form a 100 TB
    * table actually runs: streaming appends leave a long tail of small
    * files, and re-writing the whole table to fix them is O(table)
    * where this is O(small tail).  Returns the unchanged version when
    * fewer than two small files exist (nothing to bin-pack — a commit
    * would churn the log for no layout change).  Same
    * optimistic-concurrency rule as [[compact]]: a concurrent commit
    * between snapshot and claim aborts the rewrite (orphans for
    * [[vacuum]]), because a rewriter must not publish against a stale
    * file set. */
  def compactSmall(spark: SparkSession, path: String,
      thresholdBytes: Long): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    val small = snap.files.filter(f =>
      fs.getFileStatus(new Path(table, f)).getLen < thresholdBytes)
    if (small.size < 2) return snap.version
    val df = readFiles(spark, path, snap, small).coalesce(1)
    val adds = writeData(spark, df, table, fs)
    val actions = small.map(Act("remove", _)) ++
      adds.map { case (p, s) => Act("add", p, s) }
    publish(fs, table, snap.version + 1, actions)
    snap.version + 1
  }

  /** [[compact]] with Z-ORDER clustering: rewrite the live files sorted
    * by the Morton interleave of two integer columns ([[ZOrder]]), range-
    * partitioned into `files` chunks — so every rewritten file carries a
    * TIGHT min/max box on BOTH dimensions and [[readWhere]]'s stats
    * pruning skips on either column (or both).  This is the OPTIMIZE
    * ZORDER BY of the Delta world reduced to this log: clustering +
    * per-file statistics replacing the reference's composite btree
    * indexes (`utils/db_schema_main.py` CREATE INDEX (farmer, month)) at
    * object-store scale.  The helper z column is dropped before the
    * write — clustering must not change the table schema.  Same
    * optimistic-concurrency rule as [[compact]]: a concurrent commit
    * aborts the rewrite. */
  def compactZOrder(spark: SparkSession, path: String, colA: String,
      colB: String, files: Int): Long = {
    import org.apache.spark.sql.functions.col
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    require(snap.files.nonEmpty, s"TxLog: nothing to compact at $path")
    val df = readFiles(spark, path, snap, snap.files)
      .withColumn("_graft_z",
        org.apache.spark.sql.functions.expr(ZOrder.sparkSql(colA, colB)))
      .repartitionByRange(files, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
    val adds = writeData(spark, df, table, fs)
    val actions = snap.files.map(Act("remove", _)) ++
      adds.map { case (p, s) => Act("add", p, s) }
    publish(fs, table, snap.version + 1, actions)
    snap.version + 1
  }

  /** Test seam: invoked between a [[deleteWhere]] snapshot resolution
    * and each publish attempt, so specs can interleave a concurrent
    * commit deterministically.  Production value is a no-op. */
  private[graft] var deleteRaceHook: () => Unit = () => ()

  /** [[deleteRaceHook]]'s twin for the [[merge]] retry loop. */
  private[graft] var mergeRaceHook: () => Unit = () => ()

  /** Row-level DELETE WHERE over the commit log — the file-granular
    * GDPR/tombstone delete [[Sinks.eraseKeys]] can only do at PARTITION
    * granularity: find the files that contain a matching row
    * (`input_file_name` over the live snapshot — at scale the predicate
    * pushes into this scan, so non-matching files are skipped at the
    * row-group level; the stats pruner cuts the candidate list before
    * the scan even opens), rewrite ONLY those files without the matching
    * rows, and commit remove(affected)+add(rewrites) atomically.
    * Untouched files are carried by reference — their bytes are never
    * read or rewritten (spec-asserted on the file list), which at 100 TB
    * is the difference between a deletion batch costing O(affected
    * files) and O(table).
    *
    * Concurrency follows Delta's WriteSerializable rules: a concurrent
    * commit that did not REMOVE any of the targeted files (an append, or
    * a disjoint rewrite) COMMUTES — the delete re-reads the log and
    * retries at the next version, applying to the snapshot it originally
    * scanned (concurrently-appended rows are not covered; they were not
    * visible to this delete).  A concurrent commit that removed a
    * targeted file is a real conflict: [[ConcurrentRewrite]], the
    * rewrite is abandoned (orphans for [[vacuum]]) and the caller
    * re-runs against the new state.  Pre-delete versions stay readable
    * until vacuum — which is also the audit trail.  Returns the
    * committed version (unchanged if nothing matched). */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: Column): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    if (snap.files.isEmpty) return snap.version
    // Stats pruning first: only files whose min/max admit a match are
    // even scanned for affected-file discovery — against THIS verb's
    // snapshot, not a fresh one, so discovery/rewrite/commit agree.
    val (_, candidates) = pruneFilesIn(spark, path, predicate, snap)
    if (candidates.isEmpty) return snap.version
    val withFile = readFiles(spark, path, snap, candidates)
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
    // survive — hence the coalesce.  The snapshot schema applies, so a
    // predicate on an evolved column works over pre-evolution files.
    val survivors = readFiles(spark, path, snap, affectedRel)
      .filter(!org.apache.spark.sql.functions.coalesce(predicate,
        org.apache.spark.sql.functions.lit(false)))
    val adds = writeData(spark, survivors, table, fs)
    val actions = affectedRel.map(Act("remove", _)) ++
      adds.map { case (p, s) => Act("add", p, s) }
    var version = snap.version + 1
    var attempts = 0
    while (true) {
      attempts += 1
      deleteRaceHook()
      try {
        publish(fs, table, version, actions)
        maybeAutoCheckpoint(spark, path, version)
        return version
      } catch {
        case c: CommitConflict =>
          if (attempts >= 50) throw c
          val fresh = snapshot(spark, path)
          val gone = affectedRel.filterNot(fresh.files.contains)
          if (gone.nonEmpty) throw new ConcurrentRewrite(path, gone)
          version = fresh.version + 1 // commuting commit: retry past it
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Keyed UPSERT (MERGE INTO): table rows whose `keys` tuple appears
    * in `incoming` are REPLACED by the incoming row, unmatched incoming
    * rows are INSERTED — one atomic commit, so readers see either the
    * whole merge or none of it.  The [[Sinks.merge]] semantics on the
    * commit log, file-granular like [[deleteWhere]]: only files that
    * CONTAIN a matched key are rewritten (found by a semi-join of the
    * live scan against the incoming keys — AQE broadcasts the key set
    * when it is small, the common batch-vs-table shape); untouched files
    * are carried by reference, so a 100 TB table pays O(affected files),
    * not O(table).  The incoming frame is evaluated EXACTLY ONCE — its
    * data files are staged first and every subsequent pass (duplicate
    * check, matched-key joins) reads those immutable files back, so a
    * nondeterministic source cannot desynchronize the check from the
    * commit.  SQL equality governs matching: NULL keys never match and
    * are always inserted (the MERGE ON rule).  Incoming must be unique
    * on `keys` (checked loudly — two updates to one key in one batch
    * have no defined order).  Schema evolution follows [[append]].
    *
    * Concurrency = [[deleteWhere]]'s WriteSerializable rules: commits
    * that did not remove a targeted file commute (a concurrent append's
    * matching rows were not visible to this merge and are NOT deduped —
    * Delta's documented blind-append behavior); a concurrent rewrite of
    * a targeted file raises [[ConcurrentRewrite]].  Returns the
    * committed version (unchanged when `incoming` is empty). */
  def merge(spark: SparkSession, incoming: DataFrame, path: String,
      keys: Seq[String]): Long =
    mergeImpl(spark, incoming, path, keys, Nil, requireUniqueKeys = true)

  /** KEY-GROUP reload: delete every row whose `keys` tuple appears in
    * `incoming`, insert all of `incoming` — one atomic commit.  The
    * [[Sinks.overwriteByKey]] idempotent-reload semantics (the
    * reference's `DELETE WHERE key IN batch` + INSERT) on the commit
    * log: unlike [[merge]], a key tuple may map to MANY incoming rows
    * (a month×farmer group), because the unit of replacement is the
    * GROUP, not the row.  Same file-granular rewrite and concurrency
    * rules as merge. */
  def replaceKeys(spark: SparkSession, incoming: DataFrame, path: String,
      keys: Seq[String]): Long =
    mergeImpl(spark, incoming, path, keys, Nil, requireUniqueKeys = false)

  /** [[merge]] carrying a `txn` writer-idempotence marker in the same
    * atomic commit — the upsert twin of [[appendBatch]]: a replayed
    * micro-batch (crash after the sink committed, before the checkpoint
    * advanced) is recognized via [[lastCommittedBatch]] and SKIPPED, so
    * a streaming CDC upsert is exactly-once end to end.  Returns whether
    * the batch was applied (false = already in the table). */
  def mergeBatch(spark: SparkSession, incoming: DataFrame, path: String,
      keys: Seq[String], appId: String, batchId: Long): Boolean = {
    if (lastCommittedBatch(spark, path, appId).exists(_ >= batchId))
      return false
    mergeImpl(spark, incoming, path, keys,
      Seq(Act("txn", s"$appId:$batchId")), requireUniqueKeys = true)
    true
  }

  private def mergeImpl(spark: SparkSession, incoming: DataFrame,
      path: String, keys: Seq[String], extraActs: Seq[Act],
      requireUniqueKeys: Boolean): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    require(keys.nonEmpty, "TxLog: merge needs at least one key column")
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    // Stage incoming FIRST: the single evaluation of the caller's frame.
    val insertAdds = writeData(spark, incoming, table, fs)
    if (insertAdds.isEmpty) return snap.version
    validateStaged(spark, snap.constraints, insertAdds,
      mergeSchemas(snap.schema, incoming.schema, path), path)
    val inc = spark.read.schema(incoming.schema)
      .parquet(insertAdds.map { case (p, _) => s"$path/$p" }: _*)
    if (requireUniqueKeys) {
      val dup = inc.groupBy(keys.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"TxLog: merge batch has duplicate keys on (${keys.mkString(",")})" +
          s" — e.g. ${dup.headOption.getOrElse("")}")
    }
    val incKeys = inc.select(keys.map(col): _*).distinct()
    val affectedRel: Seq[String] =
      if (snap.files.isEmpty) Nil
      else readFiles(spark, path, snap, snap.files)
        .withColumn("_graft_file", input_file_name())
        .join(incKeys, keys, "left_semi")
        .select(col("_graft_file")).distinct()
        .collect().map(_.getString(0)).toSeq
        .map(u => relativize(table, new Path(new java.net.URI(u))))
        .sorted
    // Survivors of the affected files: matched rows drop (replaced by
    // the staged incoming), NULL-key and unmatched rows carry.
    val survivorAdds =
      if (affectedRel.isEmpty) Nil
      else writeData(spark,
        readFiles(spark, path, snap, affectedRel)
          .join(incKeys, keys, "left_anti"), table, fs)
    val actions = affectedRel.map(Act("remove", _)) ++
      (survivorAdds ++ insertAdds).map { case (p, s) => Act("add", p, s) }
    // The meta action is recomputed per attempt: a commuting concurrent
    // append may itself have widened the schema, and a stale meta would
    // silently regress it.
    var base = snap
    var attempts = 0
    while (true) {
      attempts += 1
      mergeRaceHook()
      try {
        publish(fs, table, base.version + 1,
          metaAction(base, incoming.schema, table) ++ extraActs ++ actions)
        maybeAutoCheckpoint(spark, path, base.version + 1)
        return base.version + 1
      } catch {
        case c: CommitConflict =>
          if (attempts >= 50) throw c
          val fresh = snapshot(spark, path)
          val gone = affectedRel.filterNot(fresh.files.contains)
          if (gone.nonEmpty) throw new ConcurrentRewrite(path, gone)
          // A commuting commit may have REGISTERED a constraint or
          // evolved the schema after validateStaged ran — re-validate
          // the staged inserts before retrying past it (survivors are
          // table rows the concurrent addConstraint itself validated).
          revalidateIfMetaChanged(spark, snap, insertAdds,
            incoming.schema, path)(fresh)
          base = fresh // commuting commit: retry past it
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Transactional REPLACE WHERE — delete every row matching
    * `predicate` AND insert `df`, in ONE atomic commit: the idempotent
    * scoped reload that is the reference's whole load discipline
    * (delete-month-then-insert, `load.py` everywhere /
    * [[Sinks.overwriteByDateRange]]) expressed on the commit log, where
    * a crash can no longer strand the gap between the delete and the
    * insert and a re-run converges to the same state.  Incoming rows
    * must all SATISFY the predicate (checked loudly against the staged
    * files — the Delta replaceWhere constraint; otherwise a re-run
    * would not be idempotent: rows outside the scope would survive the
    * next replace and duplicate).  File-granular like [[deleteWhere]]:
    * stats pruning bounds the affected-file scan, survivors of affected
    * files are rewritten without matching rows, untouched files carry
    * by reference.  An empty `df` is a pure scoped delete.  Same
    * commute/conflict retry rules as [[deleteWhere]]. */
  def replaceWhere(spark: SparkSession, df: DataFrame, path: String,
      predicate: Column): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name, coalesce, lit}
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, path)
    val insertAdds = writeData(spark, df, table, fs)
    if (insertAdds.nonEmpty) {
      val bad = spark.read.schema(df.schema)
        .parquet(insertAdds.map { case (p, _) => s"$path/$p" }: _*)
        .filter(!coalesce(predicate, lit(false))).limit(1).collect()
      require(bad.isEmpty,
        "TxLog: replaceWhere incoming rows must satisfy the predicate " +
          s"(violator: ${bad.headOption.getOrElse("")})")
    }
    validateStaged(spark, snap.constraints, insertAdds,
      mergeSchemas(snap.schema, df.schema, path), path)
    val affectedRel: Seq[String] =
      if (snap.files.isEmpty) Nil
      else {
        val (_, candidates) = pruneFilesIn(spark, path, predicate, snap)
        if (candidates.isEmpty) Nil
        else readFiles(spark, path, snap, candidates)
          .withColumn("_graft_file", input_file_name())
          .filter(predicate)
          .select(col("_graft_file")).distinct()
          .collect().map(_.getString(0)).toSeq
          .map(u => relativize(table, new Path(new java.net.URI(u))))
          .sorted
      }
    val survivorAdds =
      if (affectedRel.isEmpty) Nil
      else writeData(spark,
        readFiles(spark, path, snap, affectedRel)
          .filter(!coalesce(predicate, lit(false))), table, fs)
    val actions = affectedRel.map(Act("remove", _)) ++
      (survivorAdds ++ insertAdds).map { case (p, s) => Act("add", p, s) }
    if (actions.isEmpty) return snap.version
    var base = snap
    var attempts = 0
    while (true) {
      attempts += 1
      try {
        publish(fs, table, base.version + 1,
          metaAction(base, df.schema, table) ++ actions)
        maybeAutoCheckpoint(spark, path, base.version + 1)
        return base.version + 1
      } catch {
        case c: CommitConflict =>
          if (attempts >= 50) throw c
          val fresh = snapshot(spark, path)
          val gone = affectedRel.filterNot(fresh.files.contains)
          if (gone.nonEmpty) throw new ConcurrentRewrite(path, gone)
          // Re-validate staged inserts if a commuting commit changed
          // the constraint set or schema (see mergeImpl's handler).
          revalidateIfMetaChanged(spark, snap, insertAdds,
            df.schema, path)(fresh)
          base = fresh
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Files added by PURE-APPEND commits in versions (since, latest] —
    * the incremental-consumption primitive a downstream job uses to
    * process ONLY what arrived since its last run, without a full-table
    * diff.  A commit containing any `remove` is a REWRITE
    * (compact/zorder/delete/overwrite): its adds re-describe rows that
    * already existed, so they are EXCLUDED — the published Delta
    * streaming-source rule (rewrites are layout changes, not data;
    * consuming past one without `ignoreChanges` is an error there, a
    * clean skip here because this log separates appends from rewrites
    * per commit).  Version numbers are claimed contiguously, so a gap
    * in the surviving commit files means [[cleanupLog]] pruned part of
    * the requested range — that fails loudly rather than silently
    * skipping data a consumer never saw. */
  def appendsSince(spark: SparkSession, path: String,
      since: Long): (Long, Seq[String]) = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val vs = versions(fs, table)
    val upTo = (vs ++ checkpointVersions(fs, table)).maxOption.getOrElse(0L)
    require(since <= upTo,
      s"TxLog: appendsSince($since) but $path is at version $upTo")
    val inRange = vs.filter(v => v > since && v <= upTo)
    require(inRange == (since + 1 to upTo),
      s"TxLog: commits in ($since, $upTo] of $path were pruned by log " +
        s"retention (surviving: ${inRange.mkString(",")}); the " +
        "incremental range is no longer reconstructible")
    val files = for {
      v <- inRange
      acts = readCommit(fs, commitPath(table, v))
      if !acts.exists(_.a == "remove")
      a <- acts if a.a == "add"
    } yield a.p
    (upTo, files)
  }

  /** Read the rows appended in (since, latest] — see [[appendsSince]].
    * Files superseded by a later rewrite are still readable until
    * [[vacuum]] (the tombstone design doubles as the CDC retention
    * window); past it the scan fails loudly, Delta's documented
    * behavior too. */
  def readAppendsSince(spark: SparkSession, path: String,
      since: Long): DataFrame = {
    val (_, files) = appendsSince(spark, path, since)
    val snap = snapshot(spark, path)
    if (files.isEmpty) {
      val schema = snap.schema.getOrElse(
        readFiles(spark, path, snap, snap.files).schema)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    }
    readFiles(spark, path, snap, files)
  }

  /** CHANGE DATA FEED: the row-level changes committed in versions
    * (since, latest], as data columns plus `_change_type`
    * ('insert'|'delete') and `_commit_version` — what a downstream
    * incremental materialization consumes to stay in sync without a
    * full-table diff, deletes included (which [[readAppendsSince]]
    * cannot express).  Derived per commit from the log itself, no
    * write-path cooperation needed: a commit's data-change is the
    * MULTISET difference of its added vs removed rows —
    * inserts = adds ∖ removes, deletes = removes ∖ adds — so
    *  - pure appends emit all their rows as inserts,
    *  - [[deleteWhere]] emits exactly the deleted rows (the carried
    *    survivor rows cancel),
    *  - [[merge]] emits delete(old)+insert(new) per updated key, the
    *    Delta CDF update encoding, plus plain inserts for new keys,
    *  - [[compact]]/[[compactZOrder]] emit NOTHING (adds ≡ removes —
    *    layout changes are not data changes).
    * Every read uses the LATEST schema, so evolved columns align across
    * versions (pre-evolution rows read them as NULL on both sides of
    * the diff).  Cost: one `exceptAll` shuffle per commit, bounded by
    * that commit's touched files — never the table.  Removed files stay
    * readable until [[vacuum]] (the CDC retention window); a pruned
    * commit range fails loudly like [[appendsSince]]. */
  def changesSince(spark: SparkSession, path: String,
      since: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val vs = versions(fs, table)
    val upTo = (vs ++ checkpointVersions(fs, table)).maxOption.getOrElse(0L)
    require(upTo > 0L, s"TxLog: $path has no commits")
    require(since <= upTo,
      s"TxLog: changesSince($since) but $path is at version $upTo")
    val inRange = vs.filter(v => v > since && v <= upTo)
    require(inRange == (since + 1 to upTo),
      s"TxLog: commits in ($since, $upTo] of $path were pruned by log " +
        s"retention (surviving: ${inRange.mkString(",")}); the change " +
        "feed is no longer reconstructible")
    val snap = snapshot(spark, path)
    val schema = snap.schema.getOrElse(
      readFiles(spark, path, snap, snap.files).schema)
    def readList(files: Seq[String]): DataFrame =
      if (files.isEmpty) spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
      else spark.read.schema(schema)
        .parquet(files.map(f => s"$path/$f"): _*)
    // r15 (guide §2.3): BOTH diff directions from ONE signed-count
    // aggregation per commit.  The exceptAll pair each planned its own
    // full-row hash aggregate over (adds ∪ removes) — the commit's rows
    // were scanned and grouped twice per version.  `Σ ±1 grouped by all
    // data columns` is the same null-safe multiset arithmetic Spark's
    // ExceptAll rewrite runs internally: d > 0 emits d 'insert' copies
    // (= adds ∖ removes multiset), d < 0 emits −d 'delete' copies, d = 0
    // (a deleteWhere's carried survivors, a compaction's entire commit)
    // cancels — one scan and one aggregation per commit, identical rows.
    import org.apache.spark.sql.functions.{col, when, expr}
    val dataCols = schema.fieldNames.toSeq.map(col)
    val parts = inRange.map { v =>
      val acts = readCommit(fs, commitPath(table, v))
      val added = readList(acts.filter(_.a == "add").map(_.p))
      val removed = readList(acts.filter(_.a == "remove").map(_.p))
      added.withColumn("_w", lit(1L))
        .unionAll(removed.withColumn("_w", lit(-1L)))
        .groupBy(dataCols: _*)
        .agg(org.apache.spark.sql.functions.sum(col("_w")).as("_d"))
        .filter(col("_d") =!= 0L)
        .withColumn("_dup",
          org.apache.spark.sql.functions.explode(expr("sequence(1, abs(_d))")))
        .select(dataCols :+
          when(col("_d") > 0L, lit("insert")).otherwise(lit("delete"))
            .as("_change_type"): _*)
        .withColumn("_commit_version", lit(v))
    }
    parts.reduceOption(_ unionAll _).getOrElse(
      readList(Nil).withColumn("_change_type", lit("").cast("string"))
        .withColumn("_commit_version", lit(0L)))
  }

  /** RESTORE TABLE TO VERSION — METADATA-ONLY: one commit whose live
    * set becomes exactly the target version's files, no data file read
    * or rewritten (removes the current extras, re-adds the target's
    * files with their original stats, re-records the target's schema).
    * The instant rollback a bad load needs at 100 TB — and because it
    * is itself a commit, the mistake AND the rollback both stay in
    * [[history]], and the versions in between remain time-travelable.
    * Requires the target's files to still exist ([[vacuum]] may have
    * reclaimed them — checked loudly up front).  Last-writer-wins under
    * concurrency: the retry recomputes removes against the fresh state,
    * declaratively pinning the live set to the target. */
  def restoreTo(spark: SparkSession, path: String, version: Long): Long = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val target = snapshot(spark, path, Some(version))
    val missing = target.files.filterNot(f => fs.exists(new Path(table, f)))
    require(missing.isEmpty,
      s"TxLog: cannot restore $path to version $version — vacuum " +
        s"reclaimed ${missing.mkString(", ")}")
    val meta = target.schemaJson.toSeq.map(j =>
      Act("meta", java.net.URLEncoder.encode(j, "UTF-8")))
    val targetSet = target.files.toSet
    commitWithRetry(spark, fs, table, snap =>
      meta ++
        snap.files.filterNot(targetSet).map(Act("remove", _)) ++
        target.files.filterNot(snap.files.toSet)
          .map(f => Act("add", f, target.stats.getOrElse(f, ""))))
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
    * parquet paths with their encoded per-file statistics.  Nothing here
    * is visible to readers.  Stats cost one aggregation pass over the
    * just-written files (never the table). */
  private def writeData(spark: SparkSession, df: DataFrame, table: Path,
      fs: FileSystem): Seq[(String, String)] = {
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
    if (files.isEmpty) return Nil
    val stats = TxStats.collect(spark, dir.toString, df.schema)
    // A staged file with ZERO rows has no stats entry (no group forms
    // for it in the collect pass): DROP it from the commit — it carries
    // no data and, having no stats, would never be prunable.  Shows up
    // when a rewrite's survivors are empty (delete matched a whole
    // file); the orphan is reclaimed by [[vacuum]].
    val (kept, dropped) = files.partition { rel =>
      stats.contains(rel.substring(rel.lastIndexOf('/') + 1))
    }
    // Guard the drop: absence of a stats entry is only PROOF of zero
    // rows if the input_file_name()-derived names actually matched the
    // listed paths.  A silent mismatch (URI encoding, layout change)
    // would drop a LIVE data file from the commit — so any file about
    // to be dropped is re-read and must really be empty.
    dropped.foreach { rel =>
      val abs = new Path(table, rel).toString
      require(spark.read.schema(df.schema).parquet(abs).isEmpty,
        s"TxLog: staged file $rel has rows but no stats entry — " +
          "file-name mismatch between input_file_name() and the " +
          "staged listing; refusing to drop a live data file")
    }
    kept.map { rel =>
      (rel, stats(rel.substring(rel.lastIndexOf('/') + 1)))
    }
  }

  /** Highest batch id committed under `appId`, read from the `txn`
    * markers — the writer-idempotence ledger of [[appendBatch]]. */
  def lastCommittedBatch(spark: SparkSession, path: String,
      appId: String): Option[Long] = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val ids = for {
      v <- versions(fs, table)
      act <- readCommit(fs, commitPath(table, v))
      if act.a == "txn"
      i = act.p.lastIndexOf(':')
      if i > 0 && act.p.substring(0, i) == appId
    } yield act.p.substring(i + 1).toLong
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
    val pre = snapshot(spark, path)
    validateStaged(spark, pre.constraints, adds,
      mergeSchemas(pre.schema, df.schema, path), path)
    commitWithRetry(spark, fs, table, snap =>
      metaAction(snap, df.schema, table) ++
        (Act("txn", s"$appId:$batchId") +:
          adds.map { case (p, s) => Act("add", p, s) }),
      revalidateIfMetaChanged(spark, pre, adds, df.schema, path))
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

  /** Driver-gate query: orders loaded through a REAL multi-version log
    * history — append the even keys (v1), append the odd keys (v2),
    * compact the layout (v3: remove+add) — then read the LATEST snapshot
    * and aggregate.  A hash match against the plain-orders oracle proves
    * the whole replay chain: both appends visible, the compaction's
    * removes dropped exactly the superseded files, no row lost or
    * doubled across the rewrite. */
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

  /** Driver-gate incremental read: over the shared [[stagedLog]]
    * history — append evens (v1), append odds (v2), compact (v3) —
    * consume everything appended AFTER v1.  That is exactly the odd
    * keys: v2's files count, v3's rewrite adds do NOT (they re-describe
    * existing rows).  The hash match against the odd-keys oracle proves
    * the append/rewrite distinction end to end. */
  def revenueIncremental(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedLog(spark, dir)
    val snap = snapshot(spark, t)
    if (snap.version < 2L || snap.isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS DECIMAL(18,2)) AS receita",
        "CAST(0 AS BIGINT) AS min_cust")
    readAppendsSince(spark, t, since = 1L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"),
        min(col("o_custkey")).as("min_cust"))
  }

  val revenueIncrementalOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  MIN(o_custkey) AS min_cust
       |FROM orders
       |WHERE o_orderkey % 2 <> 0
       |GROUP BY 1""".stripMargin

  /** Gate staging for the MERGE query: seed the log with the keys
    * divisible by 3 (v1), then MERGE the even keys with their
    * o_totalprice DOUBLED (v2) — so evens matched by the seed are
    * UPDATED, unmatched evens are INSERTED, and odd multiples of 3
    * carry untouched.  Doubling a double is IEEE-exact, so the oracle
    * reproduces the updated values verbatim. */
  private def stagedMergeLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_merge#$dir", fp) { base =>
      val t = s"$base/orders_merge"
      val o = Sources.orders(spark, dir)
      append(spark, o.filter(col("o_orderkey") % 3 === 0), t)
      merge(spark,
        o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        t, keys = Seq("o_orderkey"))
    } + "/orders_merge"
  }

  /** Driver-gate MERGE: read the [[stagedMergeLog]] result and
    * aggregate.  A hash match against the CASE-expression oracle proves
    * all three merge outcomes at once — updated rows carry the doubled
    * price (and are NOT duplicated), inserted rows appear once,
    * untouched rows survive the file rewrite. */
  def revenueMerged(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedMergeLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS BIGINT) AS n_updated",
        "CAST(0 AS DECIMAL(18,2)) AS receita")
    read(spark, t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("o_orderkey") % 2 === 0, 1)).as("n_updated"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  val revenueMergedOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  COUNT(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS n_updated,
       |  ${Frag.sumMoney(Frag.money(
             "CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2 " +
               "ELSE o_totalprice END"))} AS receita
       |FROM orders
       |WHERE o_orderkey % 2 = 0 OR o_orderkey % 3 = 0
       |GROUP BY 1""".stripMargin

  /** Gate staging for the change-data-feed query: append evens (v1),
    * DELETE WHERE status = 'F' (v2, rewrites only affected files),
    * append odds (v3), compact (v4 — a layout change the feed must
    * report as NO data change). */
  private def stagedCdfLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_cdf#$dir", fp) { base =>
      val t = s"$base/orders_cdf"
      val o = Sources.orders(spark, dir)
      append(spark, o.filter(col("o_orderkey") % 2 === 0), t)
      deleteWhere(spark, t, col("o_orderstatus") === "F")
      append(spark, o.filter(col("o_orderkey") % 2 =!= 0), t)
      if (snapshot(spark, t).files.nonEmpty) compact(spark, t, files = 2)
    } + "/orders_cdf"
  }

  /** Driver-gate change data feed: consume the FULL change history of
    * [[stagedCdfLog]] and aggregate per (change type, status).  The
    * oracle reproduces it from plain orders — inserts are every
    * appended row, deletes are exactly the even F-status rows — so a
    * hash match proves the multiset-diff derivation end to end:
    * deleteWhere's carried survivors cancel, the compaction contributes
    * nothing, nothing is double-counted across the four commits. */
  def revenueChanges(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedCdfLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS change_type",
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_changes",
        "CAST(0 AS DECIMAL(18,2)) AS receita")
    changesSince(spark, t, since = 0L)
      .groupBy(col("_change_type").as("change_type"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_changes"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  val revenueChangesOracle: String =
    s"""SELECT 'insert' AS change_type, o_orderstatus,
       |  COUNT(*) AS n_changes,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders GROUP BY 1, 2
       |UNION ALL
       |SELECT 'delete' AS change_type, o_orderstatus,
       |  COUNT(*) AS n_changes,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders
       |WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'F'
       |GROUP BY 1, 2""".stripMargin

  /** Gate staging for the RESTORE query: append evens (v1), overwrite
    * everything with the odds (v2 — the "bad load"), restore to v1
    * (v3, metadata-only rollback). */
  private def stagedRestoreLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_restore#$dir", fp) { base =>
      val t = s"$base/orders_restore"
      val o = Sources.orders(spark, dir)
      append(spark, o.filter(col("o_orderkey") % 2 === 0), t)
      overwriteAll(spark, o.filter(col("o_orderkey") % 2 =!= 0), t)
      restoreTo(spark, t, version = 1L)
    } + "/orders_restore"
  }

  /** Driver-gate RESTORE: the latest snapshot of [[stagedRestoreLog]]
    * must be exactly the v1 evens again — the overwrite rolled back
    * without touching a data file.  Keyed by o_orderpriority so the
    * plan differs from the other txlog gates. */
  def revenueRestored(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedRestoreLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderpriority",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS DECIMAL(18,2)) AS receita",
        "CAST(0 AS BIGINT) AS max_key")
    read(spark, t)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"),
        max(col("o_orderkey")).as("max_key"))
  }

  val revenueRestoredOracle: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  MAX(o_orderkey) AS max_key
       |FROM orders WHERE o_orderkey % 2 = 0
       |GROUP BY 1""".stripMargin

  /** Gate staging for the REPLACE WHERE query: append evens (v1), then
    * replace the F-status SCOPE with the odd F rows (v2) — the
    * reference's delete-month-then-insert reload shape, one commit. */
  private def stagedReplaceLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_replace#$dir", fp) { base =>
      val t = s"$base/orders_replace"
      val o = Sources.orders(spark, dir)
      append(spark, o.filter(col("o_orderkey") % 2 === 0), t)
      replaceWhere(spark,
        o.filter(col("o_orderkey") % 2 =!= 0 &&
          col("o_orderstatus") === "F"),
        t, col("o_orderstatus") === "F")
    } + "/orders_replace"
  }

  /** Driver-gate REPLACE WHERE: after [[stagedReplaceLog]] the table
    * must hold the non-F evens plus the odd F rows — the F scope was
    * deleted and reloaded atomically, everything outside it untouched.
    * n_odd pins that the replacement rows really are the odd keys. */
  def revenueReplaced(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedReplaceLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS BIGINT) AS n_odd",
        "CAST(0 AS DECIMAL(18,2)) AS receita")
    read(spark, t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("o_orderkey") % 2 =!= 0, 1)).as("n_odd"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  val revenueReplacedOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  COUNT(CASE WHEN o_orderkey % 2 <> 0 THEN 1 END) AS n_odd,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders
       |WHERE (o_orderkey % 2 = 0 AND o_orderstatus <> 'F')
       |   OR (o_orderkey % 2 <> 0 AND o_orderstatus = 'F')
       |GROUP BY 1""".stripMargin

  /** Gate staging for the data-skipping query: orders appended as FOUR
    * disjoint o_orderkey ranges, so each commit's files carry tight,
    * non-overlapping key stats and a range predicate provably skips the
    * other chunks. */
  private def stagedRangeLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_skip#$dir", fp) { base =>
      val t = s"$base/orders_ranges"
      val o = Sources.orders(spark, dir)
      val maxKey = o.agg(max(col("o_orderkey"))).collect()(0)
      if (!maxKey.isNullAt(0)) {
        val hi = maxKey.getLong(0)
        val step = hi / 4 + 1
        for (b <- 0L until 4L)
          append(spark,
            o.filter(col("o_orderkey") >= b * step &&
              col("o_orderkey") < (b + 1) * step).coalesce(1), t)
      }
    } + "/orders_ranges"
  }

  /** Quarter of the key domain the skip gate filters on — computed the
    * same way on both engines (non-negative integer division). */
  private def skipCutoff(spark: SparkSession, dir: String): Long = {
    import org.apache.spark.sql.functions._
    Sources.orders(spark, dir).agg(max(col("o_orderkey"))).collect()(0)
      .getLong(0) / 4
  }

  /** Driver-gate data skipping: read the range-staged log WHERE
    * o_orderkey ≤ max/4 through [[readWhere]] — the stats pruner opens
    * only the first range chunk (file-count pinned by TxLogSpec; at
    * 100 TB this is the scan-cost knob) — and aggregate.  The hash match
    * against the plain WHERE oracle proves pruning never drops a
    * matching row. */
  def revenueSkipped(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedRangeLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS DECIMAL(18,2)) AS receita")
    val cut = skipCutoff(spark, dir)
    readWhere(spark, t, col("o_orderkey") <= cut)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  val revenueSkippedOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders
       |WHERE o_orderkey <= (SELECT MAX(o_orderkey) // 4 FROM orders)
       |GROUP BY 1""".stripMargin

  /** Gate staging for the row-delete query: the same four disjoint
    * key-range chunks as [[stagedRangeLog]], then a [[deleteWhere]] of
    * the first quarter of the key domain — stats pruning narrows the
    * candidate files to the one matching chunk, only that file is
    * rewritten, and the other three ride through by reference. */
  private def stagedDeleteLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_del#$dir", fp) { base =>
      val t = s"$base/orders_del"
      val o = Sources.orders(spark, dir)
      val maxKey = o.agg(max(col("o_orderkey"))).collect()(0)
      if (!maxKey.isNullAt(0)) {
        val hi = maxKey.getLong(0)
        val step = hi / 4 + 1
        for (b <- 0L until 4L)
          append(spark,
            o.filter(col("o_orderkey") >= b * step &&
              col("o_orderkey") < (b + 1) * step).coalesce(1), t)
        deleteWhere(spark, t, col("o_orderkey") <= hi / 4): Unit
      }
    } + "/orders_del"
  }

  /** Driver-gate row-level delete: read the staged log AFTER
    * deleteWhere removed the first quarter of the key domain.  The hash
    * match against the complementary-WHERE oracle proves the delete's
    * whole chain — stats-pruned candidate discovery, survivor rewrite of
    * only the affected file, carried-by-reference remainder — lost no
    * surviving row and leaked no deleted one. */
  def revenueAfterDelete(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedDeleteLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS DECIMAL(18,2)) AS receita",
        "CAST(0 AS BIGINT) AS min_key")
    read(spark, t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"),
        min(col("o_orderkey")).as("min_key"))
  }

  val revenueAfterDeleteOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  MIN(o_orderkey) AS min_key
       |FROM orders
       |WHERE o_orderkey > (SELECT MAX(o_orderkey) // 4 FROM orders)
       |GROUP BY 1""".stripMargin

  /** Gate staging for the Z-order query: orders appended as four
    * INTERLEAVED modulo chunks — every file spans the whole key domain,
    * so nothing prunes — then [[compactZOrder]] on (o_custkey,
    * o_orderkey) re-clusters the layout into four files with tight
    * two-dimensional boxes. */
  private def stagedZLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_z#$dir", fp) { base =>
      val t = s"$base/orders_z"
      val o = Sources.orders(spark, dir)
      for (b <- 0L until 4L)
        append(spark,
          o.filter(col("o_orderkey") % 4 === b).coalesce(1), t)
      if (snapshot(spark, t).files.nonEmpty)
        compactZOrder(spark, t, "o_custkey", "o_orderkey", files = 4): Unit
    } + "/orders_z"
  }

  /** Driver-gate Z-order clustering: read the z-compacted log WHERE
    * o_custkey ≤ max/4 through [[readWhere]] — before the rewrite every
    * modulo-chunked file spans the full customer range and nothing can
    * skip; after it the Morton clustering gives each file a tight
    * customer box and the pruner drops the non-matching ones (pinned in
    * TxLogSpec).  The hash match proves the clustered rewrite preserved
    * every row. */
  def revenueZOrdered(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedZLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS DECIMAL(18,2)) AS receita",
        "CAST(0 AS BIGINT) AS max_cust")
    val cut = Sources.orders(spark, dir)
      .agg(max(col("o_custkey"))).collect()(0).getLong(0) / 4
    readWhere(spark, t, col("o_custkey") <= cut)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"),
        max(col("o_custkey")).as("max_cust"))
  }

  val revenueZOrderedOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  MAX(o_custkey) AS max_cust
       |FROM orders
       |WHERE o_custkey <= (SELECT MAX(o_custkey) // 4 FROM orders)
       |GROUP BY 1""".stripMargin

  /** Gate staging for the schema-evolution query: even keys appended
    * WITHOUT o_orderpriority, odd keys appended WITH it — the second
    * append widens the table schema, and the first chunk's files must
    * read the late column as NULL. */
  private def stagedEvoLog(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"txlog_evo#$dir", fp) { base =>
      val t = s"$base/orders_evo"
      val o = Sources.orders(spark, dir)
      append(spark, o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice"), t)
      append(spark, o.filter(col("o_orderkey") % 2 =!= 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"), t)
    } + "/orders_evo"
  }

  /** Driver-gate schema evolution: the evolved log read at LATEST —
    * pre-evolution files fill the late column with NULL, so
    * COUNT(o_orderpriority) counts exactly the odd-key rows.  The
    * oracle recomputes that from the plain table; a hash match proves
    * the by-name fill semantics end to end through the log. */
  def revenueEvolved(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = stagedEvoLog(spark, dir)
    if (snapshot(spark, t).isEmpty)
      return spark.range(0).selectExpr(
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(0 AS BIGINT) AS n_orders",
        "CAST(0 AS BIGINT) AS n_priority",
        "CAST(0 AS DECIMAL(18,2)) AS receita")
    read(spark, t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("o_orderpriority")).as("n_priority"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  val revenueEvolvedOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  COUNT(CASE WHEN o_orderkey % 2 <> 0 THEN o_orderpriority END)
       |    AS n_priority,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders GROUP BY 1""".stripMargin

  /** Claim latest+1 with `actions(latestSnapshot)`; on a conflict,
    * re-snapshot and retry (bounded — a pathological livelock fails
    * loudly instead of spinning forever).  `beforePublish` runs against
    * each attempt's fresh snapshot BEFORE the claim — the hook where
    * writers re-validate staged data when a concurrent commit changed
    * the constraint set or schema (Delta fails a transaction on
    * concurrent metadata change; this engine re-checks instead, and the
    * hook throwing aborts the commit the same way). */
  private def commitWithRetry(spark: SparkSession, fs: FileSystem,
      table: Path, actions: Snapshot => Seq[Act],
      beforePublish: Snapshot => Unit = _ => ()): Long = {
    var attempts = 0
    while (true) {
      attempts += 1
      commitRaceHook()
      val snap = snapshot(spark, table.toString)
      val v = snap.version + 1
      try {
        beforePublish(snap)
        publish(fs, table, v, actions(snap))
        maybeAutoCheckpoint(spark, table.toString, v)
        return v
      } catch {
        case _: CommitConflict if attempts < 50 => // re-read and retry
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Test-only interleaving point inside [[commitWithRetry]], before
    * each attempt's snapshot — the window where a concurrent commit
    * (e.g. an [[addConstraint]] racing an [[append]]'s validated
    * publish, or vice versa) lands. */
  private[graft] var commitRaceHook: () => Unit = () => ()

  /** AUTO-CHECKPOINT cadence: after a write verb commits a version
    * divisible by this, a [[checkpoint]] is written best-effort (errors
    * swallowed — the commit already succeeded and a missed checkpoint
    * only costs replay time).  Keeps [[snapshot]] O(cadence) instead of
    * O(commits-since-manual-checkpoint): the txreplay probe measured
    * 1,000-commit replay at 210 ms vs 48 ms from 100 back and 35 ms
    * from 10 back on local FS (min of 5) — linear in distance over a
    * ~30 ms listing floor, so an unbounded log degrades every read
    * linearly forever.  100 sits at the knee: replay stays within 2×
    * the floor while the (O(live files)) checkpoint writes only 1% of
    * the time; Delta ships 10 as its cadence for the same reason with
    * far bigger checkpoints.  0 disables. */
  @volatile var autoCheckpointEvery: Int = 100

  private def maybeAutoCheckpoint(spark: SparkSession, path: String,
      committed: Long): Unit =
    if (autoCheckpointEvery > 0 && committed % autoCheckpointEvery == 0)
      try { checkpoint(spark, path); () } catch { case _: Throwable => () }

  /** [[commitWithRetry]] `beforePublish` hook for verbs that staged and
    * validated new data files against `validated`: when the attempt's
    * fresh snapshot carries a DIFFERENT constraint set or schema (a
    * concurrent [[addConstraint]]/evolving write landed after
    * [[validateStaged]] ran), the staged files are re-validated against
    * the fresh metadata, so a retried publish can never slip rows past
    * a constraint registered in between. */
  private def revalidateIfMetaChanged(spark: SparkSession,
      validated: Snapshot, adds: Seq[(String, String)],
      incoming: StructType, path: String): Snapshot => Unit = { fresh =>
    if (fresh.constraints != validated.constraints ||
        fresh.schemaJson != validated.schemaJson)
      validateStaged(spark, fresh.constraints, adds,
        mergeSchemas(fresh.schema, incoming, path), path)
  }
}
