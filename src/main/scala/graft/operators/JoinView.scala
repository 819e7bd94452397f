package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized JOIN view — the join-IVM complement of
  * [[AggIndex]] (aggregate IVM): a persisted equi-join view `V = A ⋈ B`
  * kept current under batch appends to EITHER side by the classic delta
  * rule (Blakeley et al., SIGMOD'86; every incremental-view-maintenance
  * engine since):
  *
  * {{{ ΔV  =  ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB }}}
  *
  * Every (a, b) key-match appears exactly once — at the batch where its
  * LATER side arrived (the ΔA⋈ΔB term covers same-batch arrivals) — so
  * the accumulated view equals the from-scratch join of everything
  * ingested, under ANY slicing of either side and ANY interleaving
  * (JoinViewSpec shuffles slice order and pins equality). This is the
  * "maintained enriched fact table" every lakehouse pipeline re-derives
  * nightly; here the refresh is delta-sized.
  *
  * Storage at 100 TB: THREE sibling tables under one root — the
  * accumulated inputs `a/` and `b/` (the view alone cannot produce
  * `old ⋈ Δ` terms) and the materialized `view/` — all partitioned by
  * `kb=` (hash bucket of the join key) and `batch=`. The bucketing is
  * what makes a delta ingest delta-sized: each of the two `old ⋈ Δ`
  * joins prunes the STORED side to the delta's key buckets at planning
  * time (PartitionFilters, spec-pinned), so a batch touching few keys
  * reads a sliver of history, never the table; deltas are typically
  * batch-sized so AQE broadcasts them against the pruned scan. The view
  * is append-only — no rewrite, compaction-friendly.
  *
  * Crash discipline = [[AggIndex]]'s ledger: a batch's three appends
  * (a, b, view) publish under `batch=N` partitions and only then does the
  * `_graft_committed_batch` marker advance (atomic OVERWRITE rename).
  * Every read — merged(), and the `old` sides inside ingest — filters
  * `batch <= committed`, so a writer that died mid-batch leaves only
  * invisible orphans; the next ingest deletes any `batch > committed`
  * directories before re-appending under the same id, so a retry can
  * never double-materialize a pair. mergedAsOf(N) is time travel for
  * free: the view as it stood after batch N is a prefix filter on the
  * immutable batch column.
  *
  * Contract: `key` names the join column present in both inputs; the two
  * sides' payload columns are otherwise disjoint. Batch ingest under a
  * single-writer contract (the [[IndexMaintenance]] discipline).
  */
object JoinView {

  /** Key-bucket count — fixture-sized; a production view picks thousands
    * so a delta's pruned read is a sliver of history. Persisted per table
    * and validated at every writer entry ([[KeyBuckets]]).
    */
  val NB = KeyBuckets.NB

  /** Bucket of `key` with its type resolved from the frame — the
    * canonicalized form ([[KeyBuckets.kbFor]]) keeps an INT-width delta
    * addressing the same directories as BIGINT-width stored history.
    */
  private def kbOf(df: DataFrame, key: String): Column = KeyBuckets.kbFor(df, key)

  private def commitMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_committed_batch")

  private def keyMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_join_key")

  /** Fixture-sized day-bucket count for the `pd=` layout — the
    * [[KeyBuckets.NB]] argument on the TIME axis: a production view picks
    * a count on the order of its day cardinality, so each bucket holds ~1
    * day and [[mergedForDays]] prunes to exactly the affected days. Raw
    * `pd=<day>` directories were the first design and are wrong at BOTH
    * scales: crossed with `kb=` they explode the directory count (each
    * batch writes kb x days dirs — a 7-year fixture put every row in its
    * own partition), and the bucket map bounds it at kb x PDB instead
    * while keeping the prune factor |days|/PDB. Persisted per table in
    * the day marker; correctness never depends on the bucket map —
    * [[mergedForDays]] applies an exact residual day filter after the
    * prune.
    */
  val PDB = 16

  /** Version token of the pd bucket computation (day rendering + hash).
    * Bump on ANY change to what bytes reach xxhash64 for a given day —
    * the [[KeyBuckets.HashVersion]] upgrade-axis discipline.
    */
  val DayHashVersion = "v1-daystr"

  private def dayColMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_view_day_col")

  /** The day string a timestamp payload column rolls up to — rendered in
    * the SESSION time zone, matching the day-keyed consumer's rollup key
    * (AggIndex's `date_format(date_trunc(...))`); the zone is recorded in
    * the day marker and validated on every write and pruned read, because
    * a zone change re-days rows near midnight and would silently
    * mis-bucket them.
    */
  private def dayOf(c: Column): Column =
    date_format(date_trunc("day", c), "yyyy-MM-dd")

  private def pdOf(c: Column, pdb: Int): Column =
    pmod(xxhash64(dayOf(c)), lit(pdb)).cast("int")

  private def sessionTz(spark: SparkSession): String =
    spark.conf.get("spark.sql.session.timeZone")

  private def writeDayColMarker(spark: SparkSession, path: String, dayCol: String): Unit = {
    val mp = dayColMarkerPath(path)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    try out.write(s"$dayCol\npdb=$PDB\nhash=$DayHashVersion\ntz=${sessionTz(spark)}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The payload column the view subtable is day-bucketed on (`pd=`), if
    * [[build]] was given one — root-level marker, so it survives the
    * per-subtable fold/compact swaps like the join-key marker.
    */
  def viewDayCol(spark: SparkSession, path: String): Option[String] =
    readDayMarker(spark, path).map(_._1)

  /** (dayCol, pdb) with the hash-version and time-zone guards applied —
    * every pd-addressing writer and pruned reader goes through here, so a
    * scheme or zone drift fails loudly instead of silently addressing the
    * wrong buckets.
    */
  private def dayLayout(spark: SparkSession, path: String): Option[(String, Int)] =
    readDayMarker(spark, path).map { case (dc, pdb, hash, tz) =>
      require(hash == DayHashVersion,
        s"pd= day-hash scheme mismatch at $path: this writer computes " +
          s"'$DayHashVersion' but the marker records '$hash' — stored day " +
          "buckets would be addressed wrongly; rebuild the view")
      require(tz == sessionTz(spark),
        s"pd= day layout at $path was written under session time zone '$tz' " +
          s"but this session uses '${sessionTz(spark)}' — rows near midnight " +
          "would re-day and mis-bucket; set spark.sql.session.timeZone to " +
          s"'$tz' (or rebuild the view under the new zone)")
      (dc, pdb)
    }

  private def readDayMarker(spark: SparkSession, path: String)
      : Option[(String, Int, String, String)] = {
    val mp = dayColMarkerPath(path)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        .split('\n').map(_.trim).filter(_.nonEmpty)
                  finally in.close()
      def tagged(t: String) = lines.find(_.startsWith(s"$t="))
        .map(_.stripPrefix(s"$t=")).getOrElse("")
      Some((lines(0), tagged("pdb").toInt, tagged("hash"), tagged("tz")))
    }
  }

  /** The view subtable's partition columns under the current layout. A
    * day-bucketed view drops `kb=`: no view read prunes on the join key
    * (the delta rule's pruned reads are the SIDES; merged/mergedForDays
    * prune on batch/pd), so crossing kb into the layout would only
    * multiply the directory count kb-fold — measured as the 16x
    * small-file explosion that sank the first pd design.
    */
  private def viewPartCols(spark: SparkSession, path: String): Seq[String] =
    if (viewDayCol(spark, path).isDefined) Seq("pd", "batch")
    else Seq("kb", "batch")

  private def writeKeyMarker(spark: SparkSession, path: String, key: String): Unit = {
    val mp = keyMarkerPath(path)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    try out.write(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The join-key column name, persisted at build time so key-dependent
    * reads (tombstone anti-joins) need no out-of-band metadata.
    */
  def joinKey(spark: SparkSession, path: String): String = {
    val mp = keyMarkerPath(path)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(mp), s"no join-key marker at $path — not a JoinView root")
    val in = fs.open(mp)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Ledger format: "<batch>\n<writer>" — the writer line lets a resumed
    * stream distinguish its own crash window (batch committed by THIS
    * checkpoint, applied-marker write lost) from a foreign writer having
    * taken its id space (which must fail loudly, not no-op — the no-op
    * would silently drop the new micro-batch's data).
    */
  private def markCommitted(spark: SparkSession, path: String, batch: Int,
                            writer: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val mp = commitMarkerPath(path)
    val fs = mp.getFileSystem(conf)
    // write-temp-then-OVERWRITE-rename (AggIndex's rationale): never
    // half-written, never absent once first written
    val tmp = new org.apache.hadoop.fs.Path(path, "_graft_committed_batch.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$batch\n$writer".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(mp),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def ledgerLines(spark: SparkSession, path: String): Array[String] = {
    val mp = commitMarkerPath(path)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(mp),
      s"no commit ledger at $path — not a JoinView-managed root (build first)")
    val in = fs.open(mp)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.split('\n')
    finally in.close()
  }

  private def committedBatch(spark: SparkSession, path: String): Int = {
    val raw = ledgerLines(spark, path)(0).trim
    try raw.toInt catch {
      case _: NumberFormatException => throw new IllegalStateException(
        s"corrupt commit ledger at $path (contents: '$raw')")
    }
  }

  private def committedWriter(spark: SparkSession, path: String): Option[String] = {
    val lines = ledgerLines(spark, path)
    if (lines.length < 2) None else Some(lines(1).trim)
  }

  // one file per kb directory per batch (r18; [[appendView]]'s day-layout
  // rationale applied to the kb writers too): without the clustering
  // repartition each task opens a file in every kb= directory it has rows
  // for — tasks x NB files per subtable per batch, and every later pruned
  // read lists and opens all of them. The shuffle is delta-sized.
  private def append(df: DataFrame, key: String, sub: String, batch: Int): Unit =
    PlanProbes.clusteredBy(
        df.withColumn("kb", kbOf(df, key)).withColumn("batch", lit(batch)),
        col("kb"), NB, col(key))
      .write.partitionBy("kb", "batch").mode("append").parquet(sub)

  /** Append to the VIEW subtable under its persisted layout: plain
    * `kb=/batch=` or, when [[build]] was given a `dayCol`, `kb=/pd=/batch=`
    * — the secondary day-bucket partition that makes [[mergedForDays]] a
    * storage-pruned read. Retraction rows are value-identical to the rows
    * they cancel ([[cdcTerms]]), so a +1 and its -1 always land under the
    * SAME pd and the per-bucket sign-sum is self-contained.
    */
  /** `sizeHint`: pre-join delta bytes for the clustering salt — the view
    * delta is a JOIN, whose Catalyst size estimate is a product (huge for
    * a KB-sized delta); see [[PlanProbes.clusteredBy]].
    */
  private def appendView(spark: SparkSession, df: DataFrame, key: String,
                         path: String, batch: Int,
                         sizeHint: Option[BigInt] = None): Unit =
    dayLayout(spark, path) match {
      case Some((dc, pdb)) =>
        // one file per pd directory: without the clustering shuffle every
        // task writes a file into every directory it has rows for — pd x
        // tasks files per batch, the small-file explosion that taxes
        // every later listing. The shuffle is delta-sized (exactly the
        // rows being appended).
        // salted clustering (r18; [[PlanProbes.clusteredBy]]): the bare
        // repartition(col("pd")) here was AQE-coalescable — measured
        // collapsing the view encode to one task — and a pd-count pin
        // alone caps the writers at PDB; the salt keeps every core busy
        // at <= cores/PDB files per directory
        PlanProbes.clusteredBy(
            df.withColumn("pd", pdOf(col(dc), pdb)).withColumn("batch", lit(batch)),
            col("pd"), pdb, col(key), sizeHint)
          .write.partitionBy("pd", "batch").mode("append")
          .parquet(s"$path/view")
      case None =>
        df.withColumn("kb", kbOf(df, key)).withColumn("batch", lit(batch))
          .write.partitionBy("kb", "batch").mode("append").parquet(s"$path/view")
    }

  /** Persist each subtable's schema as a SIBLING sidecar table (one empty
    * parquet file at `<sub>_schema`, beside — not inside — the data dir):
    * an EMPTY side or view — a batch with no appends for one side, a seed
    * join with no matches — writes only partition metadata, and a later
    * schema-INFERRED read of it would fail. Every read goes through the
    * sidecar schema instead, so emptiness is a value, not an error.
    * Sibling placement (r12 verdict): a sidecar INSIDE the data dir is
    * listed-and-ignored by every partitioned read (one WARN per read) and
    * must be rescued across [[IndexMaintenance.compact]]'s swap; beside it
    * the read never sees it and the swap never moves it.
    */
  private def schemaSidecarPath(sub: String): String = s"${sub}_schema"

  private def writeSchemaSidecar(df: DataFrame, key: String, sub: String): Unit = {
    df.withColumn("kb", kbOf(df, key)).withColumn("batch", lit(0))
      .limit(0).coalesce(1)
      .write.mode("overwrite").parquet(schemaSidecarPath(sub))
    SchemaCache.invalidate(schemaSidecarPath(sub))
  }

  /** View-subtable sidecar: under the day layout the partition columns
    * are (pd INT, batch) — no kb ([[viewPartCols]]'s rationale).
    */
  private def writeViewSchemaSidecar(df: DataFrame, key: String, path: String,
                                     dayCol: Option[String]): Unit = {
    (dayCol match {
      case Some(dc) => df.withColumn("pd", pdOf(col(dc), PDB))
      case None => df.withColumn("kb", kbOf(df, key))
    }).withColumn("batch", lit(0))
      .limit(0).coalesce(1)
      .write.mode("overwrite").parquet(schemaSidecarPath(s"$path/view"))
    SchemaCache.invalidate(schemaSidecarPath(s"$path/view"))
  }

  private def readSub(spark: SparkSession, sub: String): DataFrame = {
    val sidecar = new org.apache.hadoop.fs.Path(schemaSidecarPath(sub))
    val fs = sidecar.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(sidecar)) {
      // migration guard (r13 ADVICE): pre-r13 tables kept the sidecar
      // INSIDE the data dir — fail with the rebuild instruction the
      // writer path gets from the hash-version marker, not a raw
      // path-not-found from the parquet reader
      val legacy = new org.apache.hadoop.fs.Path(sub, "_schema")
      if (fs.exists(legacy)) throw new IllegalStateException(
        s"schema sidecar for $sub sits at the pre-r13 location $legacy (inside the " +
          "data dir); this view was written under the old layout — rebuild it " +
          "(JoinView.build + re-ingest) under the current sibling-sidecar layout")
      throw new IllegalStateException(
        s"no schema sidecar at $sidecar — not a JoinView subtable (build first)")
    }
    // memoized (r18): the sidecar is immutable between (re)builds and
    // this schema consult was a footer-inference job per readSub call
    val schema = SchemaCache.parquetSchema(spark, schemaSidecarPath(sub))
    spark.read.schema(schema).parquet(sub)
  }

  /** Anti-join a subtable's own `_tombstones` delete vectors out (the
    * shared [[Tombstones]] layout, per subtable so
    * [[IndexMaintenance.compact]] can reclaim each independently).
    */
  private def live(df: DataFrame, spark: SparkSession, sub: String, key: String): DataFrame =
    Tombstones.applyTo(df, spark, sub, key)

  /** A stored side, committed rows only, PRUNED to the given key buckets —
    * the read whose PartitionFilters make ingest delta-sized. Tombstoned
    * keys are anti-joined out so a later delta cannot resurrect pairs
    * with a forgotten counterpart.
    */
  private def storedPruned(spark: SparkSession, sub: String, committed: Int,
                           buckets: Array[Int], key: String): DataFrame =
    live(readSub(spark, sub)
      .filter(col("batch") <= committed && col("kb").isin(buckets.map(Int.box): _*))
      .drop("kb", "batch"), spark, sub, key)

  /** Bounded collect: at most NB bucket ids present in a delta. */
  private def bucketsOf(delta: DataFrame, key: String): Array[Int] =
    delta.select(kbOf(delta, key).as("kb")).distinct().collect().map(_.getInt(0))

  /** The delta's key-bucket ids AND the one-row-per-key contract check
    * from ONE pass over the just-written rows (r19; guide §2.4 "fewer
    * passes"): these were two separate collect jobs per side per CDC
    * batch — a per-key count grouped up to its <= NB buckets answers
    * both. The detailed per-key probe re-runs only on violation, to
    * build [[guardOneRowPerKey]]'s message (failure path).
    */
  private def bucketsAndGuard(d: DataFrame, key: String, side: String,
                              batch: Int): Array[Int] = {
    val kbC = KeyBuckets.kb(col(key), d.schema(key).dataType)
    val rows = d.groupBy(col(key)).agg(count(lit(1)).as("_c"))
      .groupBy(kbC.as("kb")).agg(max(col("_c")).as("_m"))
      .collect()
    if (rows.exists(_.getLong(1) > 1)) guardOneRowPerKey(d, key, side, batch)
    rows.map(_.getInt(0))
  }

  /** Delete `batch > committed` partition directories — orphans of a
    * writer that died between its appends and its commit. Run before
    * re-appending under the same id so a retry cannot double-materialize.
    * One listing per ingest (batch cadence, not per-trigger).
    */
  private def cleanupOrphans(spark: SparkSession, path: String, committed: Int): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dayView = viewDayCol(spark, path).isDefined
    for (sub <- Seq("a", "b", "view")) {
      val pattern =
        if (sub == "view" && dayView) s"$path/view/pd=*/batch=*"
        else s"$path/$sub/kb=*/batch=*"
      val glob = new org.apache.hadoop.fs.Path(pattern)
      val fs = glob.getFileSystem(conf)
      val hits = fs.globStatus(glob)
      if (hits != null) hits.foreach { st =>
        val id = st.getPath.getName.stripPrefix("batch=").toInt
        if (id > committed) fs.delete(st.getPath, true)
      }
    }
  }

  /** The delta-rule view increment for one batch, as a (lazy) DataFrame —
    * factored out so JoinViewSpec can plan-assert the pruned stored reads.
    */
  private def deltaTerms(spark: SparkSession, path: String, da: DataFrame,
                         db: DataFrame, key: String, committed: Int,
                         daBuckets: Option[Array[Int]] = None,
                         dbBuckets: Option[Array[Int]] = None): DataFrame = {
    val aOld = storedPruned(spark, s"$path/a", committed,
      dbBuckets.getOrElse(bucketsOf(db, key)), key)
    val bOld = storedPruned(spark, s"$path/b", committed,
      daBuckets.getOrElse(bucketsOf(da, key)), key)
    da.join(bOld, Seq(key))
      .unionByName(aOld.join(db, Seq(key)))
      .unionByName(da.join(db, Seq(key)))
  }

  def deltaView(spark: SparkSession, path: String, da: DataFrame, db: DataFrame,
                key: String): DataFrame =
    deltaTerms(spark, path, da, db, key, committedBatch(spark, path))

  /** Seed the view: batch 0 = the base join.
    *
    * `cdc = true` builds an UPSERT-capable view ([[ingestCdc]]): the view
    * subtable carries a `sgn` sign column (+1 inserts, -1 retractions —
    * the classic z-set/delta-relation generalization of the Blakeley
    * rule), reads resolve by sign-sum, and the sgn column in the
    * persisted view schema IS the mode marker — a plain [[ingest]]
    * against a CDC view (or [[ingestCdc]] against a plain one) fails
    * loudly instead of appending rows the other mode's reads would
    * misinterpret (the `_graft_tau` discipline applied to the maintenance
    * mode). CDC contract: each side holds at most ONE live row per key —
    * the Debezium row-image shape — and a delta carries at most one row
    * per key.
    */
  /** `dayCol` (either mode): name a TIMESTAMP payload column and the view
    * subtable gains a SECONDARY `pd=` day-bucket partition between `kb=`
    * and `batch=` (bucket = hash(day string) % [[PDB]], scheme + zone
    * persisted in the day marker) — the layout that makes
    * [[mergedForDays]] a PartitionFilters-pruned read, so a downstream
    * day-keyed consumer (the [[AggIndex.ingestCdc]] recompute) reads the
    * affected days' buckets instead of the whole view. Rows whose
    * `dayCol` is NULL land in the default partition and are visible only
    * to full reads.
    */
  def build(a0: DataFrame, b0: DataFrame, key: String, path: String,
            cdc: Boolean = false, dayCol: String = null): Unit = {
    // the sgn column doubles as the persisted mode marker ([[isCdc]]), so
    // a payload column named "sgn" would either be silently clobbered by
    // the CDC writer's withColumn (cdc = true) or misclassify a plain
    // view as CDC and make every later [[ingest]] refuse with a
    // misleading mode error (cdc = false) — reject it at build time on
    // BOTH modes (r15 ADVICE)
    require(!a0.columns.contains("sgn") && !b0.columns.contains("sgn"),
      "payload column 'sgn' collides with the CDC sign/mode marker — rename it")
    val spark = a0.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    // a rebuild may change subtable schemas — drop every stale memo under
    // the deleted root NOW (r19, ADVICE: relying on the per-sidecar
    // invalidation later in this build leaves a window where a failed
    // build would serve stale cached schemas)
    SchemaCache.invalidatePrefix(path)
    // r18: each side is consumed up to three times below (CDC guard, its
    // own append, the seed join) — without a persist every use re-runs
    // the caller's upstream plan (the e_pipeline_cdc sides are each a
    // projection of a table scan, re-scanned per use). Build-scoped,
    // unpersisted before returning.
    val aP = a0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bP = b0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val v0 = if (cdc) aP.join(bP, Seq(key)).withColumn("sgn", lit(1))
               else aP.join(bP, Seq(key))
      val dayOpt = Option(dayCol)
      dayOpt.foreach { dc =>
        require(v0.columns.contains(dc),
          s"dayCol '$dc' is not a view column — name a payload column of either side")
        require(!a0.columns.contains("pd") && !b0.columns.contains("pd"),
          "payload column 'pd' collides with the day-partition column — rename it")
      }
      // CDC sides are signed too: +1 row images, -1 DELETE markers
      // ([[ingestCdc]]'s delA/delB) — the marker row is how a later
      // current-state read learns the key left the side
      val aW = if (cdc) aP.withColumn("sgn", lit(1)) else aP
      val bW = if (cdc) bP.withColumn("sgn", lit(1)) else bP
      if (cdc) {
        // the row-image contract starts at the base: one live row per key
        // per side, else every later current-state resolve ties. The two
        // guards are independent — overlap them ([[Par]], r19).
        Par.run(Seq(
          () => guardOneRowPerKey(aW, key, "a", 0),
          () => guardOneRowPerKey(bW, key, "b", 0)))
      }
      // the day marker lands BEFORE any view append so appendView and every
      // later writer resolve one consistent layout
      dayOpt.foreach(dc => writeDayColMarker(spark, path, dc))
      // the three sidecar/append chains target DIFFERENT subtable
      // directories and read only the build-scoped persists — overlap
      // them ([[Par]], r19); racing persist materialization is
      // block-level-locked, each side still computes once
      Par.run(Seq(
        () => { writeSchemaSidecar(aW, key, s"$path/a")
                append(aW, key, s"$path/a", 0) },
        () => { writeSchemaSidecar(bW, key, s"$path/b")
                append(bW, key, s"$path/b", 0) },
        () => { writeViewSchemaSidecar(v0, key, path, dayOpt)
                appendView(spark, v0, key, path, 0, sizeHint = Some(
                  PlanProbes.statsBytes(aP) + PlanProbes.statsBytes(bP))) }))
    } finally { aP.unpersist(); bP.unpersist() }
    writeKeyMarker(spark, path, key)
    KeyBuckets.publish(spark, path)
    markCommitted(spark, path, 0, writer = "build")
  }

  /** Whether the view was built `cdc = true` — read off the persisted
    * view schema (the sgn column is the marker; no extra sidecar).
    */
  def isCdc(spark: SparkSession, path: String): Boolean =
    SchemaCache.parquetSchema(spark, schemaSidecarPath(s"$path/view"))
      .fieldNames.contains("sgn")

  /** Side-layout version guard (r16 ADVICE; the [[KeyBuckets]] /
    * `_graft_tau` upgrade-axis discipline applied to the signed-side
    * layout): CDC views persisted before delete markers landed in the
    * sides carry UNSIGNED a/ and b/ subtables, and the first signed read
    * ([[currentPruned]]'s `sgn === 1` filter) would die with a raw
    * unresolved-column AnalysisException — after this batch's side files
    * had already been appended. Checked at writer entry, BEFORE any
    * files land, with the rebuild path named.
    */
  private def requireSignedSides(spark: SparkSession, path: String): Unit =
    for (side <- Seq("a", "b"))
      require(readSub(spark, s"$path/$side").schema.fieldNames.contains("sgn"),
        s"CDC view at $path has a pre-signed-side layout (side $side carries no " +
          "sgn column — it was persisted before delete markers moved into the " +
          "sides). Rebuild with build(cdc = true); mergedAsOf reads of the " +
          "existing view remain exact in the meantime.")

  /** Apply one batch of appends (either side may be empty): materialize
    * ΔV by the delta rule, append all three tables, advance the ledger.
    * Returns the applied batch id.
    *
    * `batch` defaults to the next free id; an EXPLICIT id makes the call
    * replay-idempotent for streamed wiring ([[ingestStream]]): an id at
    * or below the ledger was fully applied before — the whole call
    * no-ops (a foreachBatch replay after a crash between ledger advance
    * and checkpoint commit must not double-materialize) — and an id
    * beyond the next free one fails loudly (a gap means a foreign
    * writer).
    */
  def ingest(da: DataFrame, db: DataFrame, key: String, path: String,
             batch: Int = -1, writer: String = "batch"): Int = {
    val spark = da.sparkSession
    KeyBuckets.validate(spark, path) // an NB mismatch would prune wrong buckets
    require(!isCdc(spark, path),
      s"view at $path was built cdc = true — use ingestCdc (an append-only " +
        "delta-rule batch would land unsigned rows the sign-resolving reads " +
        "cannot interpret)")
    val c = committedBatch(spark, path)
    val b = if (batch >= 0) batch else c + 1
    if (b <= c) return b // fully-committed replay: exactly-once by no-op
    require(b == c + 1,
      s"batch $b skips ahead of ledger $c at $path — a foreign writer is interleaving")
    cleanupOrphans(spark, path, c)
    // SINGLE evaluation of each caller-supplied delta: append it first,
    // then derive the delta-rule terms from the just-written batch=b
    // partitions — a non-deterministic or expensive input is computed
    // once, and the rows joined into the view are byte-identical to the
    // rows recorded in a/ and b/ by construction. The two sides' append
    // + bucket-collect chains are independent — overlap them ([[Par]],
    // r19).
    def justWritten(sub: String) =
      readSub(spark, sub).filter(col("batch") === b).drop("kb", "batch")
    var aBuckets, bBuckets = Array.empty[Int]
    Par.run(Seq(
      () => {
        append(da, key, s"$path/a", b)
        aBuckets = bucketsOf(justWritten(s"$path/a"), key)
      },
      () => {
        append(db, key, s"$path/b", b)
        bBuckets = bucketsOf(justWritten(s"$path/b"), key)
      }))
    val dv = deltaTerms(spark, path,
      justWritten(s"$path/a"), justWritten(s"$path/b"), key, c,
      daBuckets = Some(aBuckets), dbBuckets = Some(bBuckets))
    appendView(spark, dv, key, path, b, sizeHint = Some(
      PlanProbes.statsBytes(justWritten(s"$path/a")) +
        PlanProbes.statsBytes(justWritten(s"$path/b"))))
    markCommitted(spark, path, b, writer)
    b
  }

  /** A stored side pruned to the given buckets and resolved to its
    * CURRENT row per key (latest committed batch wins) — the upsert-mode
    * read: under the CDC contract each key's newest row image IS the
    * row, so the delta terms must join current state, not the append-only
    * union a plain view's terms see. Same bucket-pruned scan shape as
    * [[storedPruned]] plus one delta-sized window.
    */
  private def currentPruned(spark: SparkSession, sub: String, committed: Int,
                            buckets: Array[Int], key: String): DataFrame = {
    val raw = live(readSub(spark, sub)
      .filter(col("batch") <= committed && col("kb").isin(buckets.map(Int.box): _*))
      .drop("kb"), spark, sub, key)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("batch").desc)
    raw.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "batch")
      // a key whose LATEST side row is a -1 delete marker has left the
      // side: it is absent from the current state, not null-valued
      .filter(col("sgn") === 1).drop("sgn")
  }

  /** One side's signed persisted delta: the caller's upsert row images at
    * sgn = +1, unioned with one sgn = -1 DELETE MARKER per delete key —
    * key + null payloads (typed off the side's persisted schema), so the
    * marker lands in the same subtable/batch layout as every other row
    * and [[currentPruned]] resolves deletion as "latest row is signed
    * out" with no side-channel state.
    */
  private def signedSide(spark: SparkSession, up: DataFrame, del: DataFrame,
                         key: String, sub: String): DataFrame = {
    val marked = up.withColumn("sgn", lit(1))
    if (del == null) marked
    else {
      val payload = readSub(spark, sub).schema.fields
        .filterNot(f => Set("kb", "batch", "sgn", key).contains(f.name))
      val markers = del.select(col(key)).distinct()
        .select((col(key) +: payload.toIndexedSeq.map(f =>
          lit(null).cast(f.dataType).as(f.name))): _*)
        .withColumn("sgn", lit(-1))
      marked.unionByName(markers)
    }
  }

  /** Loud enforcement of the one-row-per-key delta contract (r15 verdict
    * What's-wrong #2): two row images (or an image + a delete) for one
    * key in one batch would TIE [[currentPruned]]'s latest-row window and
    * resolve nondeterministically — the next batch's retraction then may
    * not be value-identical to the surviving row and sign-sum reads drift
    * silently. Delta-sized groupBy (cheap); in [[ingestCdc]] it runs on
    * the JUST-WRITTEN batch (single-evaluation discipline), so a failure
    * leaves only uncommitted orphans that the next ingest's
    * [[cleanupOrphans]] removes.
    */
  private def guardOneRowPerKey(d: DataFrame, key: String, side: String,
                                batch: Int): Unit = {
    val dup = d.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"CDC delta batch $batch side $side carries ${if (dup.isEmpty) 0 else dup.head.getLong(1)} " +
        s"rows for key ${if (dup.isEmpty) "?" else dup.head.get(0)} — the row-image " +
        "contract allows at most ONE upsert-or-delete per key per side per batch " +
        "(a tie would make the current-state resolve nondeterministic and later " +
        "retractions value-divergent)")
  }

  /** Apply one batch of CDC UPSERTS to either side (the Debezium
    * row-image shape — r14 verdict task 6): each delta row REPLACES its
    * key's previous row on that side, so a fact-side correction needs no
    * manual forget + re-ingest. The delta rule generalizes with
    * RETRACTION terms (z-sets over the Blakeley rule): with touched keys
    * K = keys(Δa) ∪ keys(Δb) and A/B the pre-batch current states,
    *
    * {{{ ΔV = -(A ⋈ B)[K]  ∪  +(A' ⋈ B')[K] }}}
    *
    * where A' = Δa ∪ (A \ keys(Δa)) is the post-batch state — a pair is
    * dead iff its key was touched on either side (one retraction even
    * when BOTH sides update the same key in one batch), and the signed
    * log sums to exactly A_latest ⋈ B_latest after every batch
    * (JoinViewCdcSpec pins it under arbitrary interleavings). The view
    * stays APPEND-ONLY — retraction rows are value-identical to the rows
    * they cancel (deterministic from stored state), so sign-sum reads and
    * prefix-filter time travel both stay exact; no history is rewritten,
    * so the as-of floor never rises here.
    *
    * Scale shape: both current-state reads are partition-pruned to the
    * delta's key buckets ([[currentPruned]]); retract and insert terms
    * are semi-joined to the touched keys, so every term is delta-sized.
    * Ledger/replay/crash discipline is [[ingest]]'s verbatim: same
    * commit marker, same orphan cleanup, same explicit-id idempotence.
    *
    * DELETES (Debezium `op = d`, the third CDC op — r15 verdict task 1):
    * `delA`/`delB` carry the keys leaving each side. A delete is the
    * SAME delta rule with the key removed from the post-state instead of
    * re-inserted — K gains the delete keys, the retract term is
    * unchanged, and A' = Δa ∪ (A \ K_a) simply never re-admits them.
    * Persistence is a -1 DELETE MARKER row per key ([[signedSide]]):
    * key + typed-null payloads, landing in the side subtable under the
    * same batch, so [[currentPruned]] (and [[foldCdc]]) resolve deletion
    * as "latest row is signed out" with no side-channel state, and a
    * later re-insert of the key is an ordinary +1 row image that simply
    * out-batches the marker. This is the CHANGEFEED path (a fact leaving
    * the domain); [[forget]] remains the COMPLIANCE path (tombstones
    * that hide the key from ALL history and raise the as-of floor) —
    * a CDC delete keeps history: prefix time travel still shows the
    * pair alive before its delete batch, exactly.
    *
    * Contract: a key appears at most ONCE per side per batch across
    * upserts ∪ deletes ([[guardOneRowPerKey]], checked loudly on the
    * just-written batch — r15 verdict What's-wrong #2).
    */
  def ingestCdc(da: DataFrame, db: DataFrame, key: String, path: String,
                batch: Int = -1, writer: String = "cdc",
                delA: DataFrame = null, delB: DataFrame = null): Int = {
    val spark = da.sparkSession
    KeyBuckets.validate(spark, path)
    require(isCdc(spark, path),
      s"view at $path was not built cdc = true — plain [[ingest]] maintains it; " +
        "upserts need the signed view (rebuild with build(cdc = true))")
    require(!da.columns.contains("sgn") && !db.columns.contains("sgn"),
      "CDC deltas carry raw row images — the sgn marker is writer-managed")
    requireSignedSides(spark, path)
    val c = committedBatch(spark, path)
    val b = if (batch >= 0) batch else c + 1
    if (b <= c) return b // fully-committed replay: exactly-once by no-op
    require(b == c + 1,
      s"batch $b skips ahead of ledger $c at $path — a foreign writer is interleaving")
    cleanupOrphans(spark, path, c)
    // provably-empty signed sides skip their append AND the guard over
    // the nothing they would have written (r18): a one-sided CDC batch —
    // the common cadence — paid an empty write-job round trip and an
    // empty guard job on the untouched side every batch
    val aSigned = signedSide(spark, da, delA, key, s"$path/a")
    val bSigned = signedSide(spark, db, delB, key, s"$path/b")
    val aApp = !PlanProbes.provablyEmpty(aSigned)
    val bApp = !PlanProbes.provablyEmpty(bSigned)
    def justWritten(sub: String) =
      readSub(spark, sub).filter(col("batch") === b).drop("kb", "batch")
    // the two sides' append + contract-check/bucket-collect chains are
    // independent of each other — overlap them ([[Par]], r19); within a
    // side the probe runs on the rows that actually landed, and a
    // violation still aborts BEFORE the ledger advances, so the bad
    // batch stays invisible
    var aBuckets, bBuckets = Array.empty[Int]
    Par.run(Seq(
      if (!aApp) null else () => {
        append(aSigned, key, s"$path/a", b)
        aBuckets = bucketsAndGuard(justWritten(s"$path/a"), key, "a", b)
      },
      if (!bApp) null else () => {
        append(bSigned, key, s"$path/b", b)
        bBuckets = bucketsAndGuard(justWritten(s"$path/b"), key, "b", b)
      }))
    val wa = justWritten(s"$path/a")
    val wb = justWritten(s"$path/b")
    val keep = scala.collection.mutable.Buffer.empty[DataFrame]
    try {
      val dv = cdcTerms(spark, path, wa, wb, key, c, keep, aApp, bApp,
        buckets = Some((aBuckets ++ bBuckets).distinct))
      // positional append: align the signed delta to the persisted view
      // schema's column order (pd is writer-derived, not a delta column)
      val viewCols = SchemaCache.parquetSchema(spark, schemaSidecarPath(s"$path/view"))
        .fieldNames.filterNot(n => n == "kb" || n == "batch" || n == "pd")
      appendView(spark, dv.select(viewCols.map(col).toIndexedSeq: _*), key, path, b,
        sizeHint = Some(PlanProbes.statsBytes(wa) + PlanProbes.statsBytes(wb)))
    } finally keep.foreach(_.unpersist())
    markCommitted(spark, path, b, writer)
    b
  }

  /** The signed CDC view increment for one upsert batch, as a (lazy)
    * DataFrame — factored like [[deltaTerms]] so JoinViewCdcSpec can
    * plan-assert the pruned current-state reads.
    */
  private def cdcTerms(spark: SparkSession, path: String, da: DataFrame,
                       db: DataFrame, key: String, committed: Int,
                       keep: scala.collection.mutable.Buffer[DataFrame] = null,
                       aApp: Boolean = true, bApp: Boolean = true,
                       buckets: Option[Array[Int]] = None)
      : DataFrame = {
    // r18: the three state intermediates below are each consumed TWICE
    // (touched by the retract semi-join AND the insert semi-join; each
    // current side by the retract join AND its post-state anti-join) —
    // without a persist each use re-runs the bucket-pruned scan + the
    // latest-row window, doubling the batch's state-read cost. ingestCdc
    // passes `keep` and unpersists after the view append lands;
    // plan-inspection callers ([[cdcDeltaView]]) pass none and get the
    // plain lazy frames.
    def pin(df: DataFrame): DataFrame =
      if (keep == null) df
      else {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        keep += p; p
      }
    // da/db are SIGNED side deltas ([[signedSide]]): +1 row images,
    // -1 delete markers. A delete is the retract term with the key simply
    // NOT re-entering the post-state: the anti-join below already removes
    // every touched key from the current state, and only +1 rows re-enter.
    // non-appended sides contribute no buckets/keys by construction —
    // skip their collect jobs (the frames themselves stay in the plan;
    // an empty parquet read folds away). ingestCdc passes the bucket
    // sets its combined append-probe already collected (r19 — zero
    // extra jobs here); plan-inspection callers compute them.
    val bkts = buckets.getOrElse(
      ((if (aApp) bucketsOf(da, key) else Array.empty[Int]) ++
        (if (bApp) bucketsOf(db, key) else Array.empty[Int])).distinct)
    val touched = pin(da.select(col(key)).unionByName(db.select(col(key))).distinct())
    val aCur = pin(currentPruned(spark, s"$path/a", committed, bkts, key))
    val bCur = pin(currentPruned(spark, s"$path/b", committed, bkts, key))
    val retract = aCur.join(bCur, Seq(key))
      .join(touched, Seq(key), "left_semi")
      .withColumn("sgn", lit(-1))
    val aAfter = da.filter(col("sgn") === 1).drop("sgn")
      .unionByName(aCur.join(da.select(col(key)), Seq(key), "left_anti"))
    val bAfter = db.filter(col("sgn") === 1).drop("sgn")
      .unionByName(bCur.join(db.select(col(key)), Seq(key), "left_anti"))
    val insert = aAfter.join(bAfter, Seq(key))
      .join(touched, Seq(key), "left_semi")
      .withColumn("sgn", lit(1))
    retract.unionByName(insert)
  }

  def cdcDeltaView(spark: SparkSession, path: String, da: DataFrame,
                   db: DataFrame, key: String, delA: DataFrame = null,
                   delB: DataFrame = null): DataFrame = {
    requireSignedSides(spark, path)
    cdcTerms(spark, path,
      signedSide(spark, da, delA, key, s"$path/a"),
      signedSide(spark, db, delB, key, s"$path/b"),
      key, committedBatch(spark, path))
  }

  /** Consolidate a CDC view's signed history into its RESOLVED state —
    * the bound on merge-on-read cost ([[mergedAsOf]]'s sign-sum groupBy
    * is log-sized; after a fold it is state-sized, so a deployment that
    * reads far more than it upserts folds on its own cadence). All three
    * subtables rewrite under the single consolidated batch = the current
    * ledger: the sides collapse to their latest row per key (the exact
    * state every later [[ingestCdc]] current-read resolves anyway), the
    * view to its sign-resolved rows at sgn = +1 — value-identical to
    * what later retractions emit, so upserts after a fold cancel
    * correctly. Pending tombstones are applied by the rewrite and retire
    * with it (compact's deletion-vector contract).
    *
    * Time travel below the fold point is GONE (those states lived only
    * in the folded-away deltas), so the retention floor rises to the
    * ledger FIRST — [[AggIndex.compact]]'s consolidation contract and
    * [[forget]]'s crash order: a crash leaves floor-without-rewrite
    * (loud on reads that would have been exact), never the reverse.
    * Each subtable swaps via the `.compact_tmp`/`.compact_trash` scheme,
    * so [[IndexMaintenance.recover]] (run here per subtable on entry)
    * heals any crash window; a crash BETWEEN subtable swaps is benign —
    * each subtable's fold independently preserves every read. Runs under
    * the single-writer maintenance-window contract.
    */
  def foldCdc(spark: SparkSession, path: String): Unit = {
    require(isCdc(spark, path),
      s"foldCdc only applies to CDC views — $path has no signed view")
    val key = joinKey(spark, path)
    for (sub <- Seq("a", "b", "view"))
      IndexMaintenance.recover(spark, s"$path/$sub")
    val c = committedBatch(spark, path)
    AsofFloor.write(spark, path, floor = c,
      rewrite = s"foldCdc (signed history at or below batch $c consolidated)")
    val conf = spark.sessionState.newHadoopConf()
    def swapIn(sub: String, folded: DataFrame,
               partCols: Seq[String] = Seq("kb", "batch")): Unit = {
      val liveP = new org.apache.hadoop.fs.Path(sub)
      val fs = liveP.getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(sub + ".compact_tmp")
      val trash = new org.apache.hadoop.fs.Path(sub + ".compact_trash")
      folded.write.partitionBy(partCols: _*).mode("overwrite").parquet(tmp.toString)
      require(fs.rename(liveP, trash), s"failed to move $sub aside for the fold swap")
      require(fs.rename(tmp, liveP), s"failed to swap folded table into $sub")
      fs.delete(trash, true)
    }
    def liveRows(sub: String) =
      live(readSub(spark, sub).filter(col("batch") <= c), spark, sub, key)
    // the three subtable folds read/write disjoint directories and each
    // independently preserves every read — overlap them ([[Par]], r19);
    // a crash between swaps was always benign (scaladoc above)
    val folds: Seq[() => Unit] = Seq[() => Unit](
      () => {
        val vsub = s"$path/view"
        // pd rides through the fold as an ordinary grouping column (it is
        // a pure function of the payload timestamp, so grouping is
        // unchanged) and the rewrite keeps the day layout
        val payload = readSub(spark, vsub).columns
          .filterNot(Set("sgn", "kb", "batch").contains)
        val resolved = liveRows(vsub).drop("kb", "batch")
          .groupBy(payload.map(col).toIndexedSeq: _*)
          .agg(sum("sgn").as("_cnt"))
          .filter(col("_cnt") > 0).drop("_cnt")
          .withColumn("sgn", lit(1))
        val vparts = viewPartCols(spark, path)
        swapIn(vsub,
          (if (vparts.contains("kb")) resolved.withColumn("kb", kbOf(resolved, key))
           else resolved).withColumn("batch", lit(c)),
          partCols = vparts)
      }) ++ Seq("a", "b").map(side => () => {
        val sub = s"$path/$side"
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(col("batch").desc)
        swapIn(sub, liveRows(sub)
          .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
          .drop("_rn")
          // a key whose latest row is a -1 delete marker has left the
          // side: the fold drops it (and the marker) entirely — post-fold
          // state is exactly what currentPruned resolves
          .filter(col("sgn") === 1)
          .withColumn("batch", lit(c)))
      })
    Par.run(folds)
  }

  private def appliedMarkerPath(checkpoint: String) =
    new org.apache.hadoop.fs.Path(checkpoint, "graft_applied_batchid")

  private def readApplied(spark: SparkSession, checkpoint: String): Long = {
    val mp = appliedMarkerPath(checkpoint)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) -1L
    else {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeApplied(spark: SparkSession, checkpoint: String, batchId: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val mp = appliedMarkerPath(checkpoint)
    val fs = mp.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(checkpoint, "graft_applied_batchid.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(mp),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Stream one side's appends into the view (the enriched-fact-table
    * production shape: facts stream, the dimension side grows by batch
    * ingests between stream runs). Each micro-batch applies the delta
    * rule under a REAL pinned batch id (base + foreachBatch id, the
    * [[IndexStream.pinnedBase]] discipline). Exactly-once is carried by
    * TWO markers, because view rows are not duplicate-insensitive:
    *  - the checkpoint-local applied marker (highest foreachBatch id
    *    this checkpoint committed) makes replays definite no-ops;
    *  - the ledger's writer line closes the crash window between
    *    markCommitted and the applied-marker write (batch committed by
    *    THIS checkpoint -> no-op; committed by anyone else -> the id
    *    space was taken while the stream was stopped, and silently
    *    no-opping would DROP this micro-batch's data — fail loudly and
    *    direct the operator to a fresh checkpoint instead).
    */
  def ingestStream(da: DataFrame, key: String, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    da.writeStream
      .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
        val spark = batchDf.sparkSession
        val base = IndexStream.pinnedBase(batchDf,
          committedBatch(spark, path) + 1, checkpoint)
        if (batchId > readApplied(spark, checkpoint)) {
          val b = base + batchId.toInt
          val c = committedBatch(spark, path)
          if (b == c + 1) {
            val db = readSub(spark, s"$path/b").drop("kb", "batch").limit(0)
            ingest(batchDf, db, key, path, batch = b, writer = checkpoint)
            writeApplied(spark, checkpoint, batchId)
          } else if (b == c && committedWriter(spark, path).contains(checkpoint)) {
            // crash window: we committed b, lost the applied-marker write
            writeApplied(spark, checkpoint, batchId)
          } else {
            throw new IllegalStateException(
              s"view ledger at $c (writer ${committedWriter(spark, path).getOrElse("?")}) " +
                s"but this checkpoint's pinned id space expects batch $b — the view " +
                "was advanced outside this checkpoint while it was stopped; a silent " +
                "no-op would drop this micro-batch. Restart with a FRESH checkpoint " +
                "(the view data itself is intact).")
          }
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Right-to-be-forgotten on the JOIN KEY (a user and every enriched
    * row derived from them): O(deletes) — append the ids to each
    * subtable's `_tombstones` delete vectors; every read ([[merged]] and
    * the `old` sides inside [[ingest]]) anti-joins them out, so the
    * forgotten keys' pairs vanish AND cannot be re-derived by later
    * deltas joining stored history. Physical reclamation rides
    * [[compact]]. Serialize with ingest under the single-writer contract.
    * Contract (family-wide, same as the text/vector indexes): the delete
    * vector hides the KEY, so rows for a forgotten key re-ingested
    * BEFORE the next compact stay hidden and are reclaimed with it —
    * a legitimately returning key (re-registration) must land after the
    * tombstone retires.
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val key = joinKey(spark, path)
    val idsK = ids.select(col(key)).distinct()
    // retention floor FIRST ([[AsofFloor]]): the tombstones hide the keys
    // from EVERY batch at once, so any as-of below the current ledger
    // would silently show history missing those keys. Floor-then-append
    // is the safe crash order — a crash between the two leaves the floor
    // raised without the rewrite (loud on reads that would have been
    // exact), never the rewrite without the floor (silent wrong history).
    // The floor rises ONLY when the ids actually hide stored rows (r13
    // ADVICE: a no-op forget — ids never ingested, or already tombstoned
    // — must not retire exact time travel): one bucket-pruned existence
    // probe per subtable, the same O(ids' buckets) read shape as the
    // delta rule. (compact keeps its conservative unconditional raise
    // when ANY tombstones pend — by then the intersect answer is the
    // same question this probe answered at forget time.)
    val c = committedBatch(spark, path)
    val buckets = bucketsOf(idsK, key)
    // the existence probe reads WITHOUT the ledger filter (r14 ADVICE):
    // ids present only in a crashed writer's uncommitted orphan batch
    // would otherwise be tombstoned with no floor raise, and once the
    // retried ingest commits that batch, an as-of at it would silently
    // omit the forgotten keys instead of failing loudly at the floor.
    // Orphans destined for cleanup raise the floor conservatively — the
    // safe direction (loud where exactness was possible, never silent).
    // a day-bucketed view carries no kb= ([[viewPartCols]]); its probe
    // scans the view un-pruned — forget is the rare compliance path, and
    // the sides' pruned probes answer first in the common case
    val dayView = viewDayCol(spark, path).isDefined
    val hidesStored = Seq("a", "b", "view").exists { sub =>
      val raw = readSub(spark, s"$path/$sub")
      val pruned = if (sub == "view" && dayView) raw
        else raw.filter(col("kb").isin(buckets.map(Int.box): _*))
      !live(pruned.drop("kb", "pd", "batch"), spark, s"$path/$sub", key)
        .join(idsK, Seq(key), "left_semi").isEmpty
    }
    if (hidesStored)
      AsofFloor.write(spark, path, floor = c,
        rewrite = "forget (keys tombstoned out of every batch)")
    for (sub <- Seq("a", "b", "view"))
      Tombstones.forget(spark, s"$path/$sub", ids, idCol = key)
  }

  /** Compact each subtable in place ([[IndexMaintenance.compact]], kb/batch
    * layout preserved): merges fragment files AND physically reclaims
    * tombstoned rows, retiring the applied delete vectors with the swap.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    // reclaiming pending delete vectors makes the hide-from-every-batch
    // rewrite physical — [[forget]] already raised the floor when it
    // appended them (this write is normally a monotone no-op), but a
    // tombstone that arrived by any other path must not be reclaimed
    // without its floor. Root-level marker, so it survives the
    // per-subtable swaps untouched.
    val conf = spark.sessionState.newHadoopConf()
    val anyTombstones = Seq("a", "b", "view").exists { sub =>
      val t = new org.apache.hadoop.fs.Path(s"$path/$sub/_tombstones")
      t.getFileSystem(conf).exists(t)
    }
    if (anyTombstones)
      AsofFloor.write(spark, path, floor = committedBatch(spark, path),
        rewrite = "compact (tombstoned keys physically reclaimed from every batch)")
    val dayView = viewDayCol(spark, path).isDefined
    for (sub <- Seq("a", "b", "view")) {
      val pattern =
        if (sub == "view" && dayView) s"$path/view/pd=*/batch=*"
        else s"$path/$sub/kb=*/batch=*"
      val glob = new org.apache.hadoop.fs.Path(pattern)
      val fs = glob.getFileSystem(conf)
      val hits = fs.globStatus(glob)
      // a never-populated side has only the schema sidecar — nothing to do
      if (hits != null && hits.nonEmpty)
        IndexMaintenance.compact(spark, s"$path/$sub",
          partitionCols = if (sub == "view" && dayView) Seq("pd", "batch")
                          else Seq("kb", "batch"))
    }
  }

  /** The maintained view — committed batches only. */
  def merged(spark: SparkSession, path: String): DataFrame =
    mergedAsOf(spark, path, Int.MaxValue)

  /** The view as it stood after `upToBatch` — time travel by prefix
    * filter on the immutable batch column ([[AggIndex.mergedAsOf]]'s
    * contract: exact between maintenance events).
    *
    * CDC views ([[build]] `cdc = true`) resolve the signed delta log by
    * SIGN-SUM on the prefix: group by the payload, keep sum(sgn) > 0 —
    * exactly the state A_asof ⋈ B_asof because every upsert batch's
    * retraction is value-identical to the rows it cancels. Merge-on-read
    * (the [[AggIndex]] discipline): the resolve is one view-sized
    * hash aggregation; a physical sign-fold could ride compact if a
    * deployment reads far more than it upserts.
    */
  def mergedAsOf(spark: SparkSession, path: String, upToBatch: Int): DataFrame = {
    // retention-floor gate ([[AsofFloor]]): an as-of below the last
    // forget/reclamation fails loudly instead of silently returning the
    // rewritten (keys-hidden) history as if it were the past
    AsofFloor.check(spark, path, upToBatch)
    val c = committedBatch(spark, path)
    signResolve(live(readSub(spark, s"$path/view")
      .filter(col("batch") <= math.min(c, upToBatch))
      .drop("kb", "batch", "pd"), spark, s"$path/view", joinKey(spark, path)))
  }

  /** Sign-sum resolve of a (possibly signed) view read: group by payload,
    * keep sum(sgn) > 0; a plain view passes through.
    */
  private def signResolve(raw: DataFrame): DataFrame =
    if (!raw.columns.contains("sgn")) raw
    else {
      val payload = raw.columns.filterNot(_ == "sgn")
      raw.groupBy(payload.map(col).toIndexedSeq: _*)
        .agg(sum("sgn").as("_cnt"))
        .filter(col("_cnt") > 0)
        .drop("_cnt")
    }

  /** The maintained view RESTRICTED to the given days (`yyyy-MM-dd`
    * strings) — the day-keyed consumer's read ([[AggIndex.ingestCdc]]'s
    * pruned recompute source). Requires the `pd=` layout ([[build]]'s
    * `dayCol`): the days' bucket ids land in the scan's PartitionFilters
    * (spec-pinned), so the read touches |day-buckets|/PDB of the view —
    * with a production-sized PDB (≈ day cardinality), exactly the
    * affected days' files. An exact residual day filter runs after the
    * prune, so correctness never depends on the bucket map, and a +1/-1
    * retraction pair always shares one pd/day ([[cdcTerms]]'s
    * value-identical rule) — `mergedForDays(days) ==
    * merged().filter(day ∈ days)` by construction (JoinViewCdcSpec pins
    * it). Rows whose dayCol is NULL belong to no day and are never
    * returned here (full [[merged]] reads still see them).
    */
  def mergedForDays(spark: SparkSession, path: String, days: Seq[String]): DataFrame = {
    val (dc, pdb) = dayLayout(spark, path).getOrElse(throw new IllegalArgumentException(
      s"view at $path carries no pd= day partition — mergedForDays needs the " +
        "day layout (build with dayCol = <timestamp payload column>); a full " +
        "merged() read followed by a day filter stays exact but prunes nothing"))
    val c = committedBatch(spark, path)
    // the days' bucket ids. Canonical `yyyy-MM-dd` strings (the contract,
    // and the only form the residual day filter below can ever match)
    // hash on the DRIVER through Catalyst's own XxHash64 expression —
    // byte-identical to the written `pd=` addressing by construction, and
    // one less Spark job per correction batch (r19; this ran a |days|-row
    // job per call). Anything non-canonical falls back to the exact
    // written expression as a tiny local job.
    val canonical = days.forall(_.matches("""\d{4}-\d{2}-\d{2}"""))
    val pds =
      if (canonical) days.map { d =>
        // seed 42 = the xxhash64() SQL function's fixed seed — the same
        // expression class the pd= writer evaluates
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(d),
            org.apache.spark.sql.types.StringType)), 42L)
          .eval(null).asInstanceOf[Long]
        val m = h % pdb
        (if (m < 0) m + pdb else m).toInt
      }.distinct.toArray
      else {
        import spark.implicits._
        days.toDS().select(pdOf(col("value").cast("timestamp"), pdb))
          .distinct().collect().map(_.getInt(0))
      }
    signResolve(live(readSub(spark, s"$path/view")
      .filter(col("batch") <= c && col("pd").isin(pds.map(Int.box): _*))
      .drop("kb", "batch", "pd"), spark, s"$path/view", joinKey(spark, path))
      .filter(dayOf(col(dc)).isin(days.map(d => d: Any): _*)))
  }

  /** Stream CDC upserts of side `a` into the view — [[ingestStream]]'s
    * wiring (pinned batch ids, applied marker, writer-line crash window)
    * with [[ingestCdc]] as the per-trigger apply, so a streamed row image
    * REPLACES its key's previous row instead of appending a duplicate
    * pair. Exactly-once carries over unchanged: ingestCdc is
    * explicit-id idempotent and the two markers close the same windows.
    */
  def upsertStream(da: DataFrame, key: String, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    cdcStreamApply(da, key, path, checkpoint, df => (df, null))

  /** Stream a FULL CHANGEFEED of side `a` — upserts AND deletes in one
    * stream, the complete Debezium op set: each row carries its op in
    * `opCol` ('d' = delete, only the key is read; anything else —
    * INCLUDING a NULL op, null-safe split per the r16 ADVICE — is an
    * upsert row image, so a malformed feed row is applied-and-visible
    * rather than silently landing in neither branch). A trigger
    * carrying upserts and deletes for
    * DIFFERENT keys applies atomically under one batch id (one
    * [[ingestCdc]] call); a same-key collision within a trigger fails
    * the one-row-per-key guard loudly rather than applying in an
    * arbitrary order. Wiring (pinned ids, applied marker, writer-line
    * crash window) is [[upsertStream]]'s verbatim — they share
    * [[cdcStreamApply]].
    */
  def cdcStream(da: DataFrame, key: String, path: String, checkpoint: String,
                opCol: String = "op")
      : org.apache.spark.sql.streaming.StreamingQuery =
    cdcStreamApply(da, key, path, checkpoint, df => (
      df.filter(!col(opCol).eqNullSafe("d")).drop(opCol),
      df.filter(col(opCol).eqNullSafe("d")).select(col(key))))

  private def cdcStreamApply(da: DataFrame, key: String, path: String,
                             checkpoint: String,
                             split: DataFrame => (DataFrame, DataFrame))
      : org.apache.spark.sql.streaming.StreamingQuery =
    da.writeStream
      .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
        val spark = batchDf.sparkSession
        val base = IndexStream.pinnedBase(batchDf,
          committedBatch(spark, path) + 1, checkpoint)
        if (batchId > readApplied(spark, checkpoint)) {
          val b = base + batchId.toInt
          val c = committedBatch(spark, path)
          if (b == c + 1) {
            // drop the persisted side sign too: ingestCdc takes RAW row
            // images and manages the marker itself
            val db = readSub(spark, s"$path/b").drop("kb", "batch", "sgn").limit(0)
            val (ups, dels) = split(batchDf)
            ingestCdc(ups, db, key, path, batch = b, writer = checkpoint,
              delA = dels)
            writeApplied(spark, checkpoint, batchId)
          } else if (b == c && committedWriter(spark, path).contains(checkpoint)) {
            writeApplied(spark, checkpoint, batchId)
          } else {
            throw new IllegalStateException(
              s"view ledger at $c (writer ${committedWriter(spark, path).getOrElse("?")}) " +
                s"but this checkpoint's pinned id space expects batch $b — the view " +
                "was advanced outside this checkpoint while it was stopped; a silent " +
                "no-op would drop this micro-batch. Restart with a FRESH checkpoint " +
                "(the view data itself is intact).")
          }
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
