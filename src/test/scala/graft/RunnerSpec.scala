package graft

import java.nio.file.Files

import graft.core.{JdbcEnv, RunConfig, Sinks, Sources}

/** End-to-end proof of the pipeline runner (the `run_etl` analog): the
  * full P1–P6 graph runs extract → transform → keyed reload into a temp
  * warehouse, and re-running is byte-identical per table — the
  * reference's idempotency contract carried through the WHOLE job graph,
  * not just the sink primitives. */
class RunnerSpec extends SparkSpec {

  // 3 months back keeps the fechamento range small; semantics identical.
  private val cfg = RunConfig(monthsBack = 3)

  private def tableRows(out: String, table: String): Seq[String] =
    spark.read.parquet(s"$out/$table").collect()
      .map(_.toString).sorted.toSeq

  test("full graph: all six pipelines load, run-twice equals run-once") {
    val out = Files.createTempDirectory("graft_e2e").toString
    val first = Run.runAll(spark, Sf001, out, cfg)
    assert(first.size == 6)
    assert(first.forall(_.ok), s"failures: ${first.filterNot(_.ok)}")
    assert(first.forall(_.rows > 0))
    val snap = first.map(r => r.table -> tableRows(out, r.table)).toMap
    // Reported row count is the stored row count.
    first.foreach(r => assert(snap(r.table).size.toLong == r.rows))

    val second = Run.runAll(spark, Sf001, out, cfg)
    assert(second.forall(_.ok))
    second.foreach { r =>
      assert(tableRows(out, r.table) == snap(r.table),
        s"${r.table} drifted on re-run")
    }
  }

  test("warm-up executes every selected plan on the sample dir and changes nothing (r10 #8)") {
    val out = Files.createTempDirectory("graft_e2e_warm").toString
    // Cold E2E baseline (no warm-up).
    val cold = Run.runAll(spark, Sf001, out, cfg)
    assert(cold.forall(_.ok))
    val snap = cold.map(r => r.table -> tableRows(out, r.table)).toMap
    // Warm-up: each selected pipeline's OWN plan runs on the sample dir;
    // every plan really executed (non-zero sample rows) and NOTHING was
    // written anywhere (no warehouse path is even passed in).
    val warmLog = Seq.newBuilder[String]
    val warmed = Run.warmUp(spark, Sf001, cfg, log = warmLog += _)
    assert(warmed.size == 6)
    assert(warmed.forall(_._2 > 0))
    assert(warmLog.result().count(_.startsWith("[warmup]")) == 6)
    // E2E after warm-up is byte-identical to the cold run.
    val after = Run.runAll(spark, Sf001, out, cfg)
    assert(after.forall(_.ok))
    after.foreach(r => assert(tableRows(out, r.table) == snap(r.table),
      s"${r.table} drifted after warm-up"))
    // --warmup is a known CLI flag (the contract main() parses).
    val sel = Run.warmUp(spark, Sf001, cfg, Set("receita_cliente"))
    assert(sel.map(_._1) == Seq("receita_cliente"))
  }

  test("txlog sink mode: full graph on the commit log, run-twice equals run-once") {
    import graft.core.TxLog
    val out = Files.createTempDirectory("graft_e2e_txlog").toString
    def txRows(table: String): Seq[String] =
      TxLog.read(spark, s"$out/$table").collect()
        .map(_.toString).sorted.toSeq
    val first = Run.runAll(spark, Sf001, out, cfg, txlog = true)
    assert(first.size == 6)
    assert(first.forall(_.ok), s"failures: ${first.filterNot(_.ok)}")
    assert(first.forall(_.rows > 0))
    val snap = first.map(r => r.table -> txRows(r.table)).toMap
    first.foreach(r => assert(snap(r.table).size.toLong == r.rows))
    // Parquet-sink and txlog-sink warehouses hold identical content
    // (compared in sorted-column order: partitionBy moves the key
    // columns to the end of the parquet read-back schema).
    val pq = Files.createTempDirectory("graft_e2e_pq").toString
    Run.runAll(spark, Sf001, pq, cfg)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    first.foreach { r =>
      assert(canon(TxLog.read(spark, s"$out/${r.table}")) ==
        canon(spark.read.parquet(s"$pq/${r.table}")),
        s"${r.table}: txlog content diverges from the parquet sink")
    }
    // Idempotency through atomic commits: re-run converges, and every
    // table gained history (the previous generation stays readable).
    val second = Run.runAll(spark, Sf001, out, cfg, txlog = true)
    assert(second.forall(_.ok))
    second.foreach { r =>
      assert(txRows(r.table) == snap(r.table), s"${r.table} drifted")
      val v = TxLog.snapshot(spark, s"$out/${r.table}").version
      assert(v >= 2L, s"${r.table}: expected a second generation, at v$v")
      assert(TxLog.read(spark, s"$out/${r.table}", asOf = Some(v - 1))
        .collect().map(_.toString).sorted.toSeq == snap(r.table),
        s"${r.table}: pre-rerun generation not time-travelable")
    }
  }

  test("farmer-scoped reload touches only that farmer, like DELETE WHERE farmer_id") {
    val out = Files.createTempDirectory("graft_e2e_scope").toString
    assert(Run.runAll(spark, Sf001, out, cfg,
      Set("receita_farmer_m_passado")).forall(_.ok))
    val before = tableRows(out, "receita_farmer_m_passado")
    val othersBefore = spark.read.parquet(s"$out/receita_farmer_m_passado")
      .filter("farmer_id <> 7").collect().map(_.toString).sorted.toSeq
    val filesBefore = Sinks.dataFiles(spark, s"$out/receita_farmer_m_passado")
      .filterNot(_.toString.contains("farmer_id=7")).map(_.toString).sorted

    // Scoped re-run: farmer 7 reloads; everyone else's partitions must
    // survive UNOPENED (the keyed-DELETE semantics at file granularity).
    val scoped = Run.runAll(spark, Sf001, out, cfg.copy(farmerId = Some(7)),
      Set("receita_farmer_m_passado"))
    assert(scoped.forall(_.ok) && scoped.head.rows > 0)
    assert(tableRows(out, "receita_farmer_m_passado") == before)
    assert(spark.read.parquet(s"$out/receita_farmer_m_passado")
      .filter("farmer_id <> 7").collect().map(_.toString).sorted.toSeq
      == othersBefore)
    assert(Sinks.dataFiles(spark, s"$out/receita_farmer_m_passado")
      .filterNot(_.toString.contains("farmer_id=7")).map(_.toString).sorted
      == filesBefore)
  }

  test("corpus curation target: opt-in by name, lang-partitioned, idempotent") {
    val out = Files.createTempDirectory("graft_e2e_cur").toString
    // NOT part of --kpi all (run_etl's six reference pipelines only).
    assert(Run.runAll(spark, Sf001, out, cfg).size == 6)
    val res = Run.runAll(spark, Sf001, out, cfg, Set("corpus_curation"))
    assert(res.size == 1 && res.head.ok && res.head.rows > 0)
    val table = spark.read.parquet(s"$out/documents_curated")
    assert(table.count() == res.head.rows)
    // Curated = exact-dedup survivors passing the quality gate.
    assert(table.columns.toSet ==
      Set("doc_id", "lang", "source", "text", "n_tokens"))
    assert(table.select("text").distinct().count() == res.head.rows)
    // Lang-partitioned layout, run-twice idempotent.
    assert(graft.core.Sinks.dataFiles(spark, s"$out/documents_curated")
      .forall(_.getParent.getName.startsWith("lang=")))
    val before = tableRows(out, "documents_curated")
    Run.runAll(spark, Sf001, out, cfg, Set("corpus_curation"))
    assert(tableRows(out, "documents_curated") == before)
  }

  test("summary JSON is valid and carries per-pipeline status") {
    val out = Files.createTempDirectory("graft_e2e_sum").toString
    val ok = Run.runAll(spark, Sf001, out, cfg, Set("receita_farmer_m_passado"))
    val bad = Run.runAll(spark, "/nonexistent_sf_dir", out, cfg,
      Set("receita_cliente"))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(Run.summaryJson(ok ++ bad))
    assert((j \ "ok") == JBool(false))
    val pipes = (j \ "pipelines").asInstanceOf[JArray].arr
    assert(pipes.size == 2)
    assert((pipes.head \ "kpi") == JString("receita_farmer_m_passado"))
    assert((pipes.head \ "ok") == JBool(true))
    assert((pipes(1) \ "ok") == JBool(false))
    assert((pipes(1) \ "error").isInstanceOf[JString])
    val JInt(total) = (j \ "total_rows"): @unchecked
    assert(total == ok.head.rows)
  }

  test("a failing pipeline is captured per-result; unknown --kpi rejects") {
    val out = Files.createTempDirectory("graft_e2e_fail").toString
    val res = Run.runAll(spark, "/nonexistent_sf_dir", out, cfg,
      Set("receita_farmer_m_passado"))
    assert(res.size == 1 && res.head.error.isDefined)
    intercept[IllegalArgumentException] {
      Run.runAll(spark, Sf001, out, cfg, Set("no_such_kpi"))
    }
  }

  test("degenerate inputs through the FULL load path: empty extraction never truncates") {
    import org.apache.spark.sql.functions.lit
    val tables = Seq("lineitem", "orders", "customer", "nation",
      "supplier", "part", "region", "events", "documents", "embeddings")
    def stage(tag: String)(xf: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): String = {
      val dir = Files.createTempDirectory(s"graft_run_degen_$tag").toString
      tables.foreach { t =>
        xf(graft.core.Sources.table(spark, Sf001, t))
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      dir
    }
    val emptyDir = stage("empty")(_.limit(0))

    // A healthy warehouse, then an EMPTY extraction over it: the reference
    // skips the load on an empty frame ("DataFrame vazio", load.py:29-32),
    // so every table must survive byte-identical — an upstream outage must
    // never truncate analysis tables.
    val out = Files.createTempDirectory("graft_run_degen_wh").toString
    val healthy = Run.runAll(spark, Sf001, out, cfg)
    assert(healthy.forall(_.ok))
    val snap = healthy.map(r => r.table -> tableRows(out, r.table)).toMap
    val emptyRun = Run.runAll(spark, emptyDir, out, cfg)
    assert(emptyRun.forall(_.ok), s"failures: ${emptyRun.filterNot(_.ok)}")
    assert(emptyRun.forall(_.rows == 0))
    healthy.foreach(r =>
      assert(tableRows(out, r.table) == snap(r.table),
        s"${r.table} was touched by an empty run"))

    // All-NULL measures through the full write path: no pipeline throws,
    // the write lands, and the reload stays idempotent.
    val nullDir = stage("nulls") { df =>
      Seq("l_extendedprice", "l_quantity", "l_discount", "o_totalprice")
        .filter(df.columns.contains).foldLeft(df)((d, c) =>
          d.withColumn(c, lit(null).cast(d.schema(c).dataType)))
    }
    val out2 = Files.createTempDirectory("graft_run_degen_wh2").toString
    val nullRun = Run.runAll(spark, nullDir, out2, cfg)
    assert(nullRun.forall(_.ok), s"failures: ${nullRun.filterNot(_.ok)}")
    val snap2 = nullRun.filter(_.rows > 0)
      .map(r => r.table -> tableRows(out2, r.table)).toMap
    val nullRun2 = Run.runAll(spark, nullDir, out2, cfg)
    assert(nullRun2.forall(_.ok))
    snap2.keys.foreach(t =>
      assert(tableRows(out2, t) == snap2(t), s"$t drifted on re-run"))
  }

  test("jdbc sink mode drives the same graph through the transactional Derby path") {
    // Credentials included: Derby without authentication accepts any
    // user/password, so this exercises the credentialed connection +
    // writer-options path end-to-end (the code Postgres would hit).
    val env = JdbcEnv.fromEnv(Map(
      "DB_URL" -> "jdbc:derby:memory:graft_runner;create=true",
      "DB_USER" -> "etl", "DB_PASSWORD" -> "secret"))
    val out = Files.createTempDirectory("graft_e2e_jdbc").toString
    val kpis = Set("receita_farmer_m_passado", "fechamento_farmer_m_presente")
    val first = Run.runAll(spark, Sf001, out, cfg, kpis, jdbc = Some(env))
    assert(first.forall(_.ok), s"failures: ${first.filterNot(_.ok)}")
    val counts = first.map(r =>
      r.table -> Sources.jdbc(spark, env, r.table).count()).toMap
    first.foreach(r => assert(counts(r.table) == r.rows))
    // Run-twice ≡ run-once through DELETE+INSERT on one transaction.
    val second = Run.runAll(spark, Sf001, out, cfg, kpis, jdbc = Some(env))
    assert(second.forall(_.ok))
    second.foreach(r =>
      assert(Sources.jdbc(spark, env, r.table).count() == counts(r.table)))
  }
}
