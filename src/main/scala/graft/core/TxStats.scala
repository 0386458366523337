package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-file min/max column statistics for [[TxLog]] — the data-skipping
  * half of the commit-log format (Delta's `stats` field on `add`
  * actions; Armbrust et al., VLDB 2020 §4.2).
  *
  * Eligible columns are the totally-ordered exact types: integrals,
  * decimals, dates, timestamps.  Doubles/floats are excluded (NaN
  * breaks the ordering argument the pruner relies on) and strings are
  * excluded (an upper bound on a TRUNCATED string prefix is not an
  * upper bound on the column — Delta increments the last kept
  * character; not worth the trap for this engine's workloads, where
  * range predicates target keys and dates).
  *
  * The pruner is deliberately CONSERVATIVE: it understands AND/OR of
  * binary comparisons and IN between one attribute and literals, and
  * keeps the file on anything else (`isNull`, functions, casts,
  * attr-to-attr).  [[TxLog.readWhere]] re-applies the predicate after
  * the scan, so a pruner gap can only cost reads, never rows.
  *
  * Encoding on the `add` action: `name:family:min:max` per column
  * joined with `|`; name and values URL-encoded, family ∈ n(umeric) /
  * D(ate, epoch days) / T(imestamp, epoch micros); an all-null file
  * column keeps empty min/max — which PROVES no comparison predicate
  * on it can match (SQL comparisons with NULL are never TRUE). */
object TxStats {

  /** A file column's stats in the comparison domain: numbers as exact
    * BigDecimal, dates as epoch days, timestamps as epoch micros.
    * `min`/`max` empty = every value in the file is NULL. */
  final case class FileCol(family: String,
      min: Option[BigDecimal], max: Option[BigDecimal])

  private def family(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("n")
    case _: DecimalType => Some("n")
    case DateType => Some("D")
    case TimestampType => Some("T")
    case _ => None
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Collected stat value → its encoded string (comparison domain). */
  private def renderValue(v: Any): String = v match {
    case null => ""
    case b: Byte => b.toString
    case s: Short => s.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: java.sql.Date =>
      d.toLocalDate.toEpochDay.toString
    case t: java.sql.Timestamp =>
      (Math.floorDiv(t.getTime, 1000L) * 1000000L +
        t.getNanos / 1000).toString
    case d: java.time.LocalDate => d.toEpochDay.toString
    case i: java.time.Instant =>
      (Math.floorDiv(i.getEpochSecond, 1L) * 1000000L +
        i.getNano / 1000).toString
    case other =>
      throw new IllegalStateException(
        s"TxStats: unexpected stat value type ${other.getClass}")
  }

  /** One aggregation pass over the freshly staged directory: per file
    * (via `input_file_name`), min/max of every eligible column.
    * Returns file NAME (not path) → encoded stats.  A file with ZERO
    * rows produces NO entry (no group forms for it) — [[TxLog]]'s
    * writeData uses that absence to drop empty staged files from the
    * commit (a rewrite whose survivors all matched would otherwise add
    * a rowless, stats-less, forever-unprunable file).  A schema with no
    * eligible column still gets per-file presence entries (empty stats
    * string) so that row-count probe works for every schema. */
  def collect(spark: SparkSession, dir: String,
      schema: StructType): Map[String, String] = {
    import org.apache.spark.sql.functions._
    val fields = schema.fields.filter(f => family(f.dataType).isDefined)
    val aggs =
      if (fields.isEmpty) Seq(count(lit(1)))
      else fields.toSeq.flatMap(f =>
        Seq(min(col(f.name)), max(col(f.name))))
    val rows = spark.read.parquet(dir)
      .groupBy(input_file_name().as("_graft_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.map { r =>
      val uri = r.getString(0)
      val name = uri.substring(uri.lastIndexOf('/') + 1)
      val colsEnc = fields.zipWithIndex.map { case (f, i) =>
        val mn = renderValue(r.get(1 + 2 * i))
        val mx = renderValue(r.get(2 + 2 * i))
        s"${enc(f.name)}:${family(f.dataType).get}:${enc(mn)}:${enc(mx)}"
      }
      name -> colsEnc.mkString("|")
    }.toMap
  }

  /** Decode an `add` action's stats string into the pruner's domain. */
  def parse(encoded: String): Map[String, FileCol] =
    if (encoded.isEmpty) Map.empty
    else encoded.split('|').toSeq.map { part =>
      val bits = part.split(":", -1)
      require(bits.length == 4, s"TxStats: malformed stats '$part'")
      val mn = dec(bits(2)); val mx = dec(bits(3))
      dec(bits(0)) -> FileCol(bits(1),
        if (mn.isEmpty) None else Some(BigDecimal(mn)),
        if (mx.isEmpty) None else Some(BigDecimal(mx)))
    }.toMap

  /** True when `CAST(from AS to)` is a PROVABLY WIDENING, value-
    * preserving injection — every `from` value maps to the numerically
    * identical `to` value.  Same-family alone is NOT enough: a
    * narrowing integral cast (BIGINT → INT) WRAPS in non-ANSI mode and
    * is not monotone, so a file whose long values all exceed int range
    * could be pruned even though the wrapped values match the literal
    * (the GDPR-delete retention bug flagged in round 9's ADVICE). */
  private def widens(from: DataType, to: DataType): Boolean = {
    // Decimal digits needed to hold an integral type losslessly.
    def digits(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(3)
      case ShortType => Some(5)
      case IntegerType => Some(10)
      case LongType => Some(19)
      case _ => None
    }
    (from, to) match {
      case (f, t) if f == t => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (f, d: DecimalType) =>
        digits(f).exists(n => d.precision - d.scale >= n)
      case (f: DecimalType, t: DecimalType) =>
        t.precision - t.scale >= f.precision - f.scale &&
          t.scale >= f.scale
      case _ => false
    }
  }

  /** Attribute side of a comparison.  A Cast over the attribute is
    * unwrapped only when it is provably [[widens widening]] within one
    * stats family — those casts are monotone value-preserving
    * injections, so pruning on the underlying column's stats against
    * the literal's comparison-domain value stays sound.  Narrowing
    * same-family casts (BIGINT → INT wraps in non-ANSI mode) and
    * cross-family casts keep the file. */
  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case u: UnresolvedAttribute => Some(u.nameParts.last)
      case a: AttributeReference => Some(a.name)
      case c: Cast if c.child.resolved &&
          family(c.child.dataType).isDefined &&
          family(c.child.dataType) == family(c.dataType) &&
          widens(c.child.dataType, c.dataType) =>
        unapply(c.child)
      case _ => None
    }
  }

  /** Literal side of a comparison: a bare literal, or a FOLDABLE cast
    * of one (the analyzer widens literals to the attribute's type) —
    * folded eagerly so the comparison-domain conversion sees the final
    * type.  An ANSI cast that would throw (overflow) yields None. */
  private object Lit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l: Literal => Some(l)
      case c: Cast if c.foldable =>
        try Some(Literal.create(c.eval(null), c.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Literal → (family, comparison-domain value).  Catalyst internal
    * representations: DateType = Int epoch days, TimestampType = Long
    * epoch micros, DecimalType = [[Decimal]].  NULL/NaN/unknown-typed
    * literals yield None (no pruning on that conjunct). */
  private def litDomain(l: Literal): Option[(String, BigDecimal)] = {
    if (l.value == null) return None
    l.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(("n", BigDecimal(l.value.toString)))
      case _: DecimalType =>
        Some(("n", BigDecimal(
          l.value.asInstanceOf[Decimal].toJavaBigDecimal)))
      case FloatType =>
        val f = l.value.asInstanceOf[Float]
        if (f.isNaN || f.isInfinite) None
        else Some(("n", BigDecimal(f.toString)))
      case DoubleType =>
        val d = l.value.asInstanceOf[Double]
        if (d.isNaN || d.isInfinite) None
        else Some(("n", BigDecimal(d.toString)))
      case DateType =>
        Some(("D", BigDecimal(l.value.asInstanceOf[Int])))
      case TimestampType =>
        Some(("T", BigDecimal(l.value.asInstanceOf[Long])))
      case _ => None
    }
  }

  /** True when the file's stats ADMIT a matching row for `e` (the
    * may-contain decision).  Conservative: unknown shapes return true.
    * Sound: a false return is a PROOF no row in the file satisfies the
    * predicate — comparisons against an interval the literal misses, or
    * any comparison over an all-null file column. */
  def mayMatch(e: Expression, st: Map[String, FileCol]): Boolean = {
    def bound(n: String, l: Literal)(
        ok: (BigDecimal, BigDecimal, BigDecimal) => Boolean): Boolean =
      (for {
        fc <- st.get(n)
        (fam, v) <- litDomain(l)
        if fam == fc.family
      } yield (fc.min, fc.max) match {
        case (Some(mn), Some(mx)) => ok(mn, mx, v)
        case _ => false // all-null column: no comparison is ever TRUE
      }).getOrElse(true)
    e match {
      case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
      case Or(l, r) => mayMatch(l, st) || mayMatch(r, st)
      case EqualTo(Attr(n), Lit(l)) =>
        bound(n, l)((mn, mx, v) => v >= mn && v <= mx)
      case EqualTo(Lit(l), Attr(n)) =>
        bound(n, l)((mn, mx, v) => v >= mn && v <= mx)
      case LessThan(Attr(n), Lit(l)) => bound(n, l)((mn, _, v) => mn < v)
      case LessThan(Lit(l), Attr(n)) => bound(n, l)((_, mx, v) => mx > v)
      case LessThanOrEqual(Attr(n), Lit(l)) =>
        bound(n, l)((mn, _, v) => mn <= v)
      case LessThanOrEqual(Lit(l), Attr(n)) =>
        bound(n, l)((_, mx, v) => mx >= v)
      case GreaterThan(Attr(n), Lit(l)) =>
        bound(n, l)((_, mx, v) => mx > v)
      case GreaterThan(Lit(l), Attr(n)) =>
        bound(n, l)((mn, _, v) => mn < v)
      case GreaterThanOrEqual(Attr(n), Lit(l)) =>
        bound(n, l)((_, mx, v) => mx >= v)
      case GreaterThanOrEqual(Lit(l), Attr(n)) =>
        bound(n, l)((mn, _, v) => mn <= v)
      case In(Attr(n), list) if list.forall(Lit.unapply(_).isDefined) =>
        list.exists(l => bound(n, Lit.unapply(l).get)(
          (mn, mx, v) => v >= mn && v <= mx))
      case _ => true
    }
  }
}
