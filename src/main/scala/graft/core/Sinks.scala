package graft.core

import org.apache.spark.sql.DataFrame

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
    * reference's targeted DELETE. */
  def overwriteByKey(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
