package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing/plan probe used during performance work (not part of the
  * driver contract).  Usage: runMain graft.tools.Probe <sfDir> <what>. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.lift(1).getOrElse("casts")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    what match {
      case "casts" =>
        time("events raw read count") {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$dir/events.parquet").count()
        }
        time("events full materialize") {
          spark.read.parquet(s"$dir/events.parquet")
            .write.format("noop").mode("overwrite").save()
        }
        time("casts query") {
          graft.ops.OperatorQueries.casts(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        time("casts query no regexp") {
          import org.apache.spark.sql.functions._
          graft.core.Sources.events(spark, dir)
            .select(col("event_id"), to_date(col("ts")).as("d"))
            .write.format("noop").mode("overwrite").save()
        }
      case "minhash" =>
        val c = time("minhash candidates") {
          graft.llm.Dedup.minhashCandidates(spark, dir).count()
        }
        println(s"[probe] candidate pairs: $c")
      case "minhash_buckets" =>
        import org.apache.spark.sql.functions._
        val sigs = time("signatures") {
          val s = graft.llm.Dedup.minhashSignatures(
            graft.core.Sources.documents(spark, dir))
          println(s"[probe] sigs: ${s.count()}")
          s
        }
        time("bucket histogram") {
          val bands = sigs.select(col("doc_id"),
            explode(expr(
              """transform(sequence(0, 15),
                | b -> struct(b AS band_id,
                |   xxhash64(concat_ws(',', slice(sig, b * 4 + 1, 4))) AS band_hash))""".stripMargin))
              .as("band"))
            .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
          bands.groupBy("band_id", "band_hash").count()
            .groupBy().agg(count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
              sum(expr("count * (count - 1) / 2")).as("raw_pairs"))
            .show(false)
        }
      case "plans" =>
        val cfg = graft.core.RunConfig.default
        Seq(
          "q_p1_receita_farmer" ->
            graft.kpi.ReceitaFarmerPassado(spark, dir, cfg),
          "q_ops_responsibility_filter" ->
            graft.ops.OperatorQueries.responsibilityFilter(spark, dir),
          "q_p6_fechamento" ->
            graft.kpi.Fechamento(spark, dir, cfg.currentMonthStart,
              isCurrent = true, cfg),
          "q_dedup_minhash" ->
            graft.llm.Dedup.minhashCandidates(spark, dir),
          "q_ann_lsh" ->
            graft.llm.Similarity.lshTopK(spark, dir)
        ).foreach { case (n, df) =>
          println(s"\n========== $n ==========")
          df.explain("formatted")
        }
      case "fech_range" =>
        val cfg = graft.core.RunConfig.default
        val months = (1 to 3).map(cfg.currentMonthStart.minusMonths(_))
        time("warm") {
          spark.read.parquet(s"$dir/lineitem.parquet")
            .write.format("noop").mode("overwrite").save()
        }
        time("one-pass range") {
          graft.kpi.Fechamento.range(spark, dir, months, cfg)
            .write.format("noop").mode("overwrite").save()
        }
        time("union of per-month") {
          months.map(m => graft.kpi.Fechamento(spark, dir, m,
            isCurrent = false, cfg))
            .reduce(_ unionByName _)
            .write.format("noop").mode("overwrite").save()
        }
        time("one-pass range (2nd)") {
          graft.kpi.Fechamento.range(spark, dir, months, cfg)
            .write.format("noop").mode("overwrite").save()
        }
      case "stream_dedupe" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = spark.read.parquet(s"$dir/events.parquet").schema
        // readStream needs a directory; glob-filter the sf dir to events
        val events = spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        val q = graft.streaming.EventsStream.dedupeStream(events)
          .writeStream.format("memory").queryName("probe_dedupe")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        val n = spark.table("probe_dedupe").count()
        val distinctIds = spark.table("probe_dedupe")
          .select("event_id").distinct().count()
        println(s"[probe] stream-deduped rows: $n, distinct ids: $distinctIds")
      case "embcos" =>
        val n = time("embedding cosine pairs") {
          graft.llm.Dedup.embeddingCosine(spark, dir).count()
        }
        println(s"[probe] embedding-cosine pairs: $n")
      case "enrich" =>
        time("responsibility enrich run1") {
          graft.ops.OperatorQueries.responsibilityEnrich(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        time("responsibility enrich run2") {
          graft.ops.OperatorQueries.responsibilityEnrich(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      case "p2" =>
        time("p2 run1") {
          graft.kpi.ReceitaFarmerPresente(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        time("p2 run2") {
          graft.kpi.ReceitaFarmerPresente(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
    }
    spark.stop()
  }
}
