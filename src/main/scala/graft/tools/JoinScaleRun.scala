package graft.tools

import org.apache.spark.sql.functions._

/** Round-11 session scale evidence for the JoinView / SqIndex / Scd2Dim
  * additions (findings land in SCALE.md):
  *
  *  1. JoinView — the IVM claim: a ~1% fact delta's ingest cost must stay
  *     FLAT as stored history grows 1x -> 10x, while the from-scratch
  *     re-join it replaces grows with history. The one-sided fact delta is
  *     the production shape (facts stream, dims rarely change); its
  *     A_old⋈ΔB term prunes to ZERO stored partitions (ΔB empty), so
  *     ingest never scans event history at all.
  *
  *  2. SqIndex — the compression claim: the stored int8 code-table scan
  *     vs the raw float exact scan over a synthetic 1M x 64-dim corpus
  *     (big enough that scan bytes, not job overheads, are the cost),
  *     plus on-disk bytes.
  *
  *  3. Scd2Dim — the bucket-rewrite claim: a 1-key merge rewrites 1/NB of
  *     the dimension, so its cost tracks BUCKET size, not batch size.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.JoinScaleRun
  */
object JoinScaleRun {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    def rmrf(p: String): Unit = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sessionState.newHadoopConf()).delete(path, true)
    }
    def duBytes(p: String): Long = {
      def go(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(go).sum).getOrElse(0L)
      go(new java.io.File(p))
    }

    // SPARK_GRAFT_SCALE_PARTS: comma-set of {jv,sq8,ivfsq,scd2} to
    // re-measure one section without paying the others (ivfsq reuses
    // sq8's synthetic corpus, so sq8 must run first or have run before)
    val parts = sys.env.getOrElse("SPARK_GRAFT_SCALE_PARTS", "jv,sq8,ivfsq,scd2")
      .split(',').toSet

    // ---------- 1. JoinView: delta-flat vs recompute-linear ----------
    if (parts("jv")) {
    val ev = graft.tables.Tables.load(spark, base, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
    val cust = graft.tables.Tables.load(spark, base, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val delta = ev.filter(col("event_id") % 100 === 7) // ~1% of sf0.1 facts
      .withColumn("event_id", col("event_id") + lit(990000000000L))
    for (copies <- Seq(1, 10, 100)) {
      val evN =
        if (copies == 1) ev
        else (0 until copies)
          .map(k => ev.withColumn("event_id", col("event_id") + lit(k * 100000000L)))
          .reduce(_ unionByName _)
      val p = s"/tmp/graft_scale_jv_${copies}x"
      rmrf(p)
      time(s"jv ${copies}x: seed build (full join, ${copies}x events)") {
        graft.operators.JoinView.build(evN, cust, "user_id", p)
      }
      time(s"jv ${copies}x: ~1%-of-1x fact delta ingest") {
        graft.operators.JoinView.ingest(delta, cust.limit(0), "user_id", p)
      }
      // the FAIR twin: a maintained view is a STORED table, so the
      // refresh it replaces re-joins AND rewrites the whole view
      time(s"jv ${copies}x: from-scratch re-join + rewrite twin") {
        rmrf(s"$p.twin")
        evN.unionByName(delta).join(cust, Seq("user_id"))
          .write.parquet(s"$p.twin")
      }
      println(s"[scale] jv ${copies}x bytes: view=${duBytes(s"$p/view")} twin=${duBytes(s"$p.twin")}")
    }
    }

    if (parts("sq8")) {
    // ---------- 2. SqIndex: stored int8 scan vs raw float scan ----------
    // the sf0.1 embeddings table is KB-scale where fixed overheads (job
    // setup, the set-semantics dedup shuffle) drown the bytes story — so
    // the corpus here is a SYNTHETIC 1M x 64-dim table (deterministic
    // hash-derived components, ~N(0,1)-ish spread), large enough that
    // scan bytes are the cost being measured
    val dim = 64
    val embDir = "/tmp/graft_scale_sq8_raw"
    if (!new java.io.File(s"$embDir/_SUCCESS").exists) {
      rmrf(embDir)
      val comps = (0 until dim).map(i =>
        ((pmod(xxhash64(col("id"), lit(i)), lit(2000001L)) - 1000000L).cast("float")
          / 1000000.0f).as(s"c$i"))
      spark.range(1000000L).select((col("id") + 1).as("vec_id"),
          array(comps: _*).cast("array<float>").as("embedding"))
        .repartition(32).write.parquet(embDir)
    }
    val emb10s = spark.read.parquet(embDir)
    val probe: Seq[Float] = emb10s.filter(col("vec_id") === 1)
      .select("embedding").collect().head.getSeq[Float](0)
    val scale = graft.operators.SqIndex.train(emb10s)
    val idx = "/tmp/graft_scale_sq8_idx"
    rmrf(idx)
    time("sq8 1M x 64d: build (train + encode + write)") {
      graft.operators.SqIndex.build(emb10s, scale, idx)
    }
    println(s"[scale] sq8 1M x 64d bytes: raw=${duBytes(embDir)} codes=${duBytes(idx)}")
    for (i <- 1 to 3) time(s"sq8 1M x 64d stored int8 top-5 scan (run $i)") {
      graft.operators.SqIndex.query(spark, idx, probe, topN = 5).collect()
    }
    // the same ranking WITHOUT the set-semantics dedup — isolates the
    // at-least-once replay tax (a full-table shuffle) from the scan itself
    for (i <- 1 to 3) time(s"sq8 1M x 64d stored int8 scan, no dedup (run $i)") {
      graft.operators.SqIndex.rank(spark.read.parquet(idx),
        graft.operators.SqIndex.encodeVec(probe, scale), topN = 5).collect()
    }
    for (i <- 1 to 3) time(s"sq8 1M x 64d raw float exact cosine top-5 (run $i)") {
      val pLit = probe.mkString("array(", "F, ", "F)")
      emb10s.select(col("vec_id"),
          expr(s"aggregate(zip_with(embedding, $pLit, (a, b) -> CAST(a AS DOUBLE) * b), 0D, (acc, x) -> acc + x)").as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5).collect()
    }
    }

    if (parts("ivfsq")) {
    // ---------- 2b. IvfSq: nProbe/K pruning vs the SQ8 full scan ----------
    // same 1M x 64-dim corpus; the probe should read ~nProbe/K = 1/8 of
    // the code bytes via list= partition pruning
    val embDir = "/tmp/graft_scale_sq8_raw"
    require(new java.io.File(s"$embDir/_SUCCESS").exists,
      "run the sq8 part first to synthesize the corpus")
    val emb1m = spark.read.parquet(embDir)
    val cents = graft.operators.IvfPqIndex.centroidsOf(emb1m)
    val scale = graft.operators.SqIndex.train(emb1m)
    val probe: Seq[Float] = cents.find(_._1 == 1L).get._2
    val idx = "/tmp/graft_scale_ivfsq_idx"
    rmrf(idx)
    time("ivfsq 1M x 64d: build (assign + encode + write)") {
      graft.operators.IvfSqIndex.build(emb1m, cents, scale, idx)
    }
    val sqIdx = "/tmp/graft_scale_sq8_idx"
    if (!new java.io.File(sqIdx).exists)
      graft.operators.SqIndex.build(emb1m, scale, sqIdx)
    for (i <- 1 to 3) time(s"ivfsq 1M x 64d pruned top-5 probe (run $i)") {
      graft.operators.IvfSqIndex.query(spark, idx, probe, cents, topN = 5).collect()
    }
    for (i <- 1 to 3) time(s"sq8 1M x 64d full-scan top-5 probe (run $i)") {
      graft.operators.SqIndex.query(spark, sqIdx, probe, topN = 5).collect()
    }
    }

    if (parts("scd2")) {
    // ---------- 3. Scd2Dim: 1-key merge cost tracks bucket size ----------
    import spark.implicits._
    for (dimKeys <- Seq(15000L, 150000L)) {
      val p = s"/tmp/graft_scale_scd2_$dimKeys"
      rmrf(p)
      val dim0 = spark.range(dimKeys).select(col("id").as("user_id"),
        lit("BASE").as("segment"))
      graft.operators.Scd2Dim.seed(dim0, "1992-01-01 00:00:00", p)
      val upd = Seq((7L, "2024-01-01 00:00:00", "X", 1L))
        .toDF("user_id", "ts", "segment", "event_id")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("segment"), col("event_id"))
      time(s"scd2 dim=$dimKeys keys: 1-key merge (rewrites 1/${graft.operators.Scd2Dim.NB})") {
        graft.operators.Scd2Dim.upsertBatch(spark, upd, p)
      }
    }
    }

    spark.stop()
  }
}
