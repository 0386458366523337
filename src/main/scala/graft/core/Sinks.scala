package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent sinks mirroring the reference's delete-then-insert reload
  * patterns (operators S4–S9).
  *
  * The reference deletes target rows then `executemany`s tuples row-at-a-time
  * (`kpi_receita_cliente/load.py:77-114` — its second scalability hazard);
  * Spark writers batch natively and commit atomically per task, so every
  * variant here is a single `df.write`:
  *
  *   - S4 full reload  → `mode("overwrite")` on the whole table
  *   - S5 keyed reload (`DELETE WHERE farmer_id=%s`,
  *     `kpi_receita_farmer_m_passado/load.py:44-48`) → dynamic partition
  *     overwrite on the key column
  *   - S6 range reload (`DELETE WHERE data BETWEEN`,
  *     `kpi_receita_cliente/load.py:54-70`) → dynamic partition overwrite on
  *     a date-derived partition column
  *   - S7 month+flag reload (`kpi_fechamento_m_presente/load.py:51-68`) →
  *     dynamic partition overwrite on composite keys
  *
  * Schema ensure / evolution (S8) is writer-managed: parquet writes carry
  * the DataFrame's StructType; evolving readers use `mergeSchema`.
  * Run-twice ≡ run-once (the reference's idempotency contract) is property-
  * tested in SinksSpec.
  */
object Sinks {

  /** S4 — full overwrite of the target. */
  def overwriteAll(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S5/S6/S7 — replace only the partitions present in `df`, keyed by
    * `partitionCols` (farmer, month, date-bucket, ...).  Requires dynamic
    * partition-overwrite so untouched keys survive, exactly like the
    * reference's targeted DELETE.  The mode is a per-write OPTION, not a
    * session conf mutation — setting it on the shared session would
    * silently change the semantics of every later partitioned overwrite. */
  def overwriteByKey(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)

  /** S8 — schema-evolution read: partitions written under different schema
    * versions (a keyed reload started shipping an extra column) read back
    * as the UNION schema, old rows NULL-filled for columns they predate.
    * This is the parquet analog of the reference's `column_exists` +
    * `ALTER TABLE ADD COLUMN` migration (`utils/db_schema_main.py:50-74`,
    * `db_schema_receita.py:70-77`): there the TABLE is widened in place;
    * here each partition keeps the schema it was written with and the
    * reader reconciles.  `mergeSchema` reads every file's footer instead of
    * sampling one — at 100 TB set `spark.sql.parquet.mergeSchema` off by
    * default and use this entry point only on evolved tables (or pin the
    * union schema explicitly via `.schema(...)` once it is known). */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
