package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Sources and sinks beyond parquet/KV-text: CSV and JSON line formats,
  * with the reference's "R output files" contract available on every
  * format (repartition to R, deterministic `out_<j>` names —
  * `w7/src/worker/workerimpl.cc:319-323`).
  */
object Sinks {

  /** Write with exactly R hash-partitioned output files named out_<j>. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      r: Int,
      keyCol: String,
      format: String = "parquet"): Unit = {
    val spark = df.sparkSession
    df.repartition(r, org.apache.spark.sql.functions.col(keyCol))
      .write.mode("overwrite").format(format).save(path)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).map(_.getPath).filter(_.getName.startsWith("part-")).foreach { p =>
      val j = p.getName.stripPrefix("part-").takeWhile(_.isDigit).toInt
      val ext = p.getName.dropWhile(_ != '.')
      fs.rename(p, new Path(dir, s"out_$j$ext"))
    }
  }

  /** MERGE INTO semantics for copy-on-write snapshots — the refresh
    * step of an incremental corpus: `changes` carries upserts (new row
    * versions) and tombstones (`deletedCol` true), and the merged
    * snapshot is every base row whose key is untouched plus every
    * non-deleted change row. Exactly the Delta/Hudi copy-on-write
    * contract, expressed relationally so it runs on bare parquet.
    *
    * Scale shape: a CDC batch is small next to the snapshot, so the
    * change KEYS broadcast (`broadcastChanges`, default) and the base
    * side never shuffles — the anti join is a map-side probe per base
    * row, the union is free, and a keyed/bucketed base layout
    * (`writeBucketed`) carries its pruning straight through to the
    * rewritten snapshot. Set `broadcastChanges=false` for a
    * backfill-sized change set and both sides hash-shuffle on the key
    * instead — same result, AQE picks the join. */
  def mergeSnapshot(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      deletedCol: String,
      broadcastChanges: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, not}
    val keys = changes.select(keyCol)
    val untouched = base.join(
      if (broadcastChanges) broadcast(keys) else keys,
      Seq(keyCol), "left_anti")
    untouched.unionByName(
      changes.where(not(col(deletedCol))).drop(deletedCol))
  }

  /** Commit one version of a log-structured snapshot table — the
    * merge-on-read complement to `mergeSnapshot`'s copy-on-write: a
    * commit APPENDS its rows (upserts + tombstones) as the hive
    * partition directory `path/__v=<version>/` and never touches any
    * earlier version's files, so per-commit cost is O(batch) at any
    * table size — the same append-only discipline as
    * `Search.updateTextIndex`'s delta partitions. Version 0 is the
    * initial snapshot. A key appears at most once per version (caller
    * contract — a CDC batch is already key-deduplicated).
    *
    * The version lives in the DIRECTORY NAME, not row data: a read at
    * `asOf` prunes newer commits at file-LISTING time
    * (`PartitionFilters`), before any footer is opened — time travel
    * is metadata-only planning. */
  def writeVersion(
      changes: DataFrame,
      path: String,
      version: Long,
      deletedCol: String = "__deleted"): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    require(version >= 0, s"version must be >= 0: $version")
    val withFlag =
      if (changes.columns.contains(deletedCol))
        changes.withColumnRenamed(deletedCol, "__deleted")
      else changes.withColumn("__deleted", lit(false))
    withFlag.withColumn("__deleted", col("__deleted").cast("boolean"))
      .write.mode("errorifexists")
      .parquet(path.stripSuffix("/") + s"/__v=$version")
  }

  /** Versions currently committed under `path` (ascending) — one
    * directory listing, the same metadata read every planner pass
    * pays. After `compactVersions` the minimum is the retention
    * horizon: history below it no longer exists. */
  def committedVersions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("__v="))
      .map(_.stripPrefix("__v=").toLong).toSeq.sorted
  }

  /** Next free version number = 1 + max committed (0 for a fresh path). */
  def nextVersion(spark: SparkSession, path: String): Long =
    committedVersions(spark, path).foldLeft(-1L)(math.max) + 1L

  /** Reconstruct the snapshot as of `asOf`: of each key's row versions
    * with `__v <= asOf`, the LATEST wins; a winning tombstone deletes
    * the key (so a later re-insert revives it — last-writer-wins over
    * the full commit log, the Hudi/Delta merge-on-read read path).
    *
    * Scale shape: the version predicate prunes newer commit
    * directories during listing, then resolution is ONE key-partitioned
    * window over base ∪ surviving deltas — the read-side cost
    * merge-on-read deliberately accepts to make commits O(batch).
    * Serving layers that read far more often than they commit fold the
    * log down with `compactVersions` and pay the window over one base
    * + few deltas. */
  def readSnapshotAt(
      spark: SparkSession,
      path: String,
      asOf: Long,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, not, row_number}
    // fail LOUD below the retention horizon: after compactVersions the
    // oldest directory is a folded base, so a read at asOf < min would
    // silently resolve against zero commits (an empty "snapshot"), the
    // worst failure mode a retired-history read can have
    val vs = committedVersions(spark, path)
    require(vs.nonEmpty, s"readSnapshotAt: no committed versions under $path")
    require(asOf >= vs.min,
      s"readSnapshotAt($asOf): history before __v=${vs.min} was retired " +
        s"by compaction/vacuum — earliest readable snapshot is ${vs.min}")
    val all = spark.read.parquet(path)
      .where(col("__v").cast("long") <= asOf)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").cast("long").desc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && not(col("__deleted")))
      .drop("__rn", "__v", "__deleted")
  }

  /** Write-audit-publish (the Iceberg-era production ingestion
    * pattern): the batch lands in a STAGING location, the
    * [[graft.ops.Constraints]] gate audits what was actually WRITTEN
    * (not the plan that produced it — a re-read catches writer bugs
    * the logical plan can't), and only a fully-clean report publishes
    * the staging directory to the final path by rename. Any violation
    * throws, leaving staging in place for inspection and the
    * published path untouched — downstream readers can never observe
    * a batch that failed its contract.
    *
    * Returns the audit report (O(rules) rows — the one bounded
    * driver-side collect, the gate must be decided before the rename).
    * The delete-then-rename publish is atomic per step (HDFS/POSIX
    * rename); a crash between them leaves the old data gone but
    * staging intact — re-running the publish is idempotent. */
  def writeAudited(
      df: DataFrame,
      path: String,
      rowRules: Seq[(String, org.apache.spark.sql.Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil,
      fdRules: Seq[(String, (Seq[String], Seq[String]))] = Nil): Seq[(String, Long)] = {
    val staging = path.stripSuffix("/") + ".staging"
    df.write.mode("overwrite").parquet(staging)
    val spark = df.sparkSession
    val report = graft.ops.Constraints
      .check(spark.read.parquet(staging), rowRules, uniqueKeys, fdRules)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val bad = report.filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"audit failed, staging left for inspection at $staging: " +
          bad.map { case (n, v) => s"$n=$v" }.mkString(", "))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(new Path(staging), dst)
    report
  }

  /** Full-history SCD-2 interval view of a versioned table (the
    * slowly-changing-dimension Type-2 shape warehouses build from CDC
    * logs): one row per committed key-version with its validity
    * interval `[eff_from, eff_to)` in commit units, `eff_to` null =
    * still current. A tombstone commit closes the prior interval and
    * contributes no row of its own; a revival opens a new one — the
    * complement of [[readSnapshotAt]]: that answers "what was true AT
    * v", this answers "when was each value true".
    *
    * Scale shape: one read of the commit log (`__v` comes from the
    * directory names — partition column, no data parse) and ONE
    * key-partitioned `lead` window — the same single-window budget as
    * the snapshot read; intervals per key = commits that touched it,
    * never corpus-scale fan-out. */
  def scd2History(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lead, not}
    val all = spark.read.parquet(path)
      .withColumn("eff_from", col("__v").cast("long"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("eff_from"))
    all.withColumn("eff_to", lead(col("eff_from"), 1).over(w))
      .where(not(col("__deleted")))
      .drop("__v", "__deleted")
  }

  /** Row-level CHANGE FEED between two versions of a versioned table
    * (Delta's `readChangeFeed` / Iceberg's changelog read, derived
    * from the commit log rather than stored): for every key whose
    * resolved state differs between `fromV` and `toV`, one row with
    * `change` ∈ insert / update / delete plus the old and new payload
    * columns (`old_<c>` / `new_<c>`, null on the absent side). A key
    * rewritten with an IDENTICAL payload emits nothing — the feed
    * reports state changes, not commit traffic — and a
    * delete-then-revive across the range collapses to what the
    * endpoints say (update if the payload moved, silence if it
    * round-tripped home).
    *
    * Scale shape: only keys TOUCHED by a commit in `(fromV, toV]` can
    * differ, so the log is first pruned to those keys with a LeftSemi
    * join (the touched-key scan itself reads only the delta
    * directories — `__v` is a partition column, pruned at listing
    * time). After the prune, both endpoint resolutions are
    * key-partitioned windows over ONE shared shuffle of the touched
    * keys' history, and the final full-outer join is between two
    * ≤|touched| relations on the same key — cost scales with the
    * change set and its history, never the table. */
  def snapshotDiff(
      spark: SparkSession,
      path: String,
      fromV: Long,
      toV: Long,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(0 <= fromV && fromV < toV, s"need 0 <= fromV < toV: $fromV/$toV")
    // same retention guard as readSnapshotAt: a diff FROM a retired
    // version would silently read an empty "old" side
    val vs = committedVersions(spark, path)
    require(vs.nonEmpty && fromV >= vs.min,
      s"snapshotDiff($fromV, $toV): history before __v=${vs.headOption.getOrElse(-1L)} " +
        "was retired by compaction/vacuum")
    val log = spark.read.parquet(path)
      .withColumn("__v", col("__v").cast("long"))
      .where(col("__v") <= toV)
    val touched = log.where(col("__v") > fromV).select(keyCol).distinct()
    val hist = log.join(touched, Seq(keyCol), "left_semi")
    val payload = hist.columns.filterNot(
      c => c == keyCol || c == "__v" || c == "__deleted").toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").desc)
    // the presence marker rides the resolved relation itself (a
    // literal true that the full-outer join nulls on the absent side),
    // so absence detection never depends on payload nullability
    def resolve(asOf: Long, side: String): DataFrame =
      hist.where(col("__v") <= asOf)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1 && not(col("__deleted")))
        .select(col(keyCol) +: lit(true).as(s"__${side}_here") +:
          payload.map(c => col(c).as(s"${side}_$c")): _*)
    val same = payload
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    resolve(fromV, "old").join(resolve(toV, "new"), Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("__old_here").isNull, lit("insert"))
          .when(col("__new_here").isNull, lit("delete"))
          .otherwise(lit("update")))
      .where(col("change") =!= "update" || not(same))
      .drop("__old_here", "__new_here")
  }

  /** Swap freshly-written `<rel>.compacting` directories into place —
    * the shared crash discipline of every index-artifact rewrite
    * (text-index compact/purge, ANN purge). Per relation: park the
    * current base at `<rel>.old`, rename `.compacting` in, delete the
    * parked copy; then delete `extraDirs` (delta directories an index
    * rewrite also folds in). No window ever holds the ONLY copy of a
    * relation: between the two renames the base name is briefly
    * absent, but both the parked old and the complete new directory
    * exist on disk — a crash there leaves a loud path-not-found (never
    * a silent truncation).
    *
    * Cross-relation atomicity rides a swap JOURNAL: before the first
    * rename, every `.compacting` sibling is verified COMPLETE (its
    * parquet `_SUCCESS` marker) and the (rels, extraDirs) manifest is
    * written to `<root>/_swap_inprogress`; the journal is removed only
    * after every rename AND every extra-dir delete. A crash anywhere
    * inside the window therefore leaves the journal on disk, and
    * [[recoverSwap]] — which every compact/purge entry point calls
    * FIRST — rolls the interrupted swap FORWARD from the journaled
    * manifest. Without the journal, a crash between two relations'
    * swaps (say after postings, before term_df) would leave a MIXED
    * index that a naive re-run silently mis-repairs: the retry would
    * recompute its decrements from the already-purged postings, find
    * an empty deleted sliver, and install stale term_df/meta stats. */
  def swapCompacting(
      spark: SparkSession,
      root: String,
      rels: Seq[String],
      extraDirs: Seq[String] = Nil): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(swapJournal(root)),
      s"swapCompacting: unrecovered interrupted swap under $root — " +
        "call recoverSwap before starting a new rewrite")
    // verify EVERY replacement is complete before touching ANY base:
    // a half-written .compacting must fail here, not get installed
    for (rel <- rels) {
      val next = new Path(s"$root/$rel.compacting")
      require(relComplete(fs, next),
        s"swapCompacting: $next looks incomplete (no _SUCCESS marker and " +
          "no data files) — refusing to install a possibly-truncated relation")
    }
    // The journal itself must commit atomically: it ends with a COMMIT
    // sentinel, and recoverSwap treats a sentinel-less journal as "the
    // swap never began" (renames only start after this write returns,
    // so a torn manifest can only come from a crash mid-write — before
    // any base was touched).
    val out = fs.create(swapJournal(root), true)
    try out.write(
      (rels.map("rel " + _) ++ extraDirs.map("extra " + _) ++ Seq(JournalCommit))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    for (rel <- rels) swapOneRel(fs, root, rel)
    extraDirs.foreach(d => fs.delete(new Path(d), true))
    fs.delete(swapJournal(root), false)
  }

  private def swapJournal(root: String): Path =
    new Path(s"$root/_swap_inprogress")

  /** Last line of a fully-written swap journal; a journal missing it is
    * a torn write from a crash BEFORE any rename started. */
  private val JournalCommit = "commit"

  /** Is `.compacting` dir `next` a complete relation replacement?
    * Normally that's the committer's `_SUCCESS` marker. Only when the
    * deployment is configured to never write one
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`) do we
    * fall back to "directory holds at least one visible data file" —
    * with markers enabled, a data-but-no-marker directory is a
    * crashed write and must NOT be installed. */
  private def relComplete(fs: FileSystem, next: Path): Boolean = {
    if (fs.exists(new Path(next, "_SUCCESS"))) true
    else if (fs.getConf.getBoolean(
        "mapreduce.fileoutputcommitter.marksuccessfuljobs", true)) false
    else fs.exists(next) && fs.listStatus(next).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** One relation's park/rename/drop, resumable from any crash point:
    * a missing `.compacting` means this relation already swapped (only
    * its parked `.old` may remain to clear); base present + `.old`
    * present means the crash fell between park and install. */
  private def swapOneRel(fs: FileSystem, root: String, rel: String): Unit = {
    val base = new Path(s"$root/$rel")
    val old = new Path(s"$root/$rel.old")
    val next = new Path(s"$root/$rel.compacting")
    if (fs.exists(next)) {
      if (fs.exists(base)) {
        if (fs.exists(old)) fs.delete(old, true)
        // Hadoop rename reports failure by RETURN VALUE, not exception —
        // an unchecked false here would silently corrupt the artifact
        require(fs.rename(base, old), s"swapCompacting: rename $base -> $old failed")
      }
      require(fs.rename(next, base), s"swapCompacting: rename $next -> $base failed")
    }
    require(fs.exists(base),
      s"swapCompacting: $base absent with no $next to install — corrupt index")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Crash recovery for [[swapCompacting]] — idempotent; every
    * compact/purge entry point calls this before reading the index.
    *
    * With a journal on disk, the interrupted swap is rolled FORWARD:
    * the journal is only ever written after every `.compacting`
    * replacement verified complete, so finishing the remaining
    * renames (and extra-dir deletes) reaches exactly the state the
    * crashed rewrite was committing. A journal MISSING its COMMIT
    * sentinel is a torn write from a crash before any rename — it is
    * discarded and handled as no-journal. Without a (committed)
    * journal, any leftover `.compacting`/`.old` siblings are from a
    * crash BEFORE the swap began — every base is still the
    * pre-rewrite original — so the leftovers are deleted (after
    * restoring `.old` to base if base is somehow absent) and the
    * caller recomputes from a consistent base. Returns true when an
    * interrupted swap was completed (the caller's rewrite is then
    * already applied). */
  def recoverSwap(spark: SparkSession, root: String, rels: Seq[String]): Boolean = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed: Option[Seq[String]] =
      if (!fs.exists(swapJournal(root))) None
      else {
        val in = fs.open(swapJournal(root))
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
        // A journal without the trailing COMMIT sentinel is normally a
        // torn write: swapCompacting only starts renaming after the full
        // journal (incl. sentinel) is on disk, so no base was touched —
        // treat as no-journal. EXCEPT the legacy case: a journal written
        // by the pre-sentinel build never carried the sentinel yet WAS
        // committed (that build too only journalled after every
        // `.compacting` verified complete). The two are distinguished by
        // RENAME PROGRESS on the journalled rels — in the torn case no
        // rename began, so every rel still has its base present, no
        // parked `.old`, and its `.compacting` untouched; any rel with
        // base absent or `.old` present, or every journalled `.compacting`
        // already gone, proves renames ran ⇒ legacy-committed ⇒ roll
        // FORWARD (the no-journal cleanup would restore `.old` on the
        // mid-rename rels while already-swapped rels keep the new
        // version — a mixed old/new set handed back as "swap never
        // began").
        if (lines.lastOption.contains(JournalCommit)) Some(lines.init)
        else {
          val jRels = lines.collect { case l if l.startsWith("rel ") => l.stripPrefix("rel ") }
          def base(rel: String) = new Path(s"$root/$rel")
          def old(rel: String) = new Path(s"$root/$rel.old")
          def next(rel: String) = new Path(s"$root/$rel.compacting")
          // mid-swap states always leave corroborating siblings (`.old`
          // parked, or base absent WITH `.compacting` still pending) —
          // a bare "base absent" could be a garbage rel name on a torn
          // line and must not trigger a roll-forward; the all-installed
          // state additionally requires every base present so truncated
          // names can't fake completion
          val progressed = jRels.nonEmpty && (
            jRels.exists { rel =>
              fs.exists(old(rel)) ||
                (!fs.exists(base(rel)) && fs.exists(next(rel)))
            } ||
              jRels.forall(rel =>
                !fs.exists(next(rel)) && fs.exists(base(rel))))
          if (progressed) Some(lines) else None
        }
      }
    committed match {
      case Some(lines) =>
        val jRels = lines.collect { case l if l.startsWith("rel ") => l.stripPrefix("rel ") }
        val jExtras = lines.collect { case l if l.startsWith("extra ") => l.stripPrefix("extra ") }
        for (rel <- jRels) swapOneRel(fs, root, rel)
        jExtras.foreach(d => fs.delete(new Path(d), true))
        fs.delete(swapJournal(root), false)
        true
      case None =>
        fs.delete(swapJournal(root), false) // torn sentinel-less journal, if any
        for (rel <- rels) {
          val base = new Path(s"$root/$rel")
          val old = new Path(s"$root/$rel.old")
          // If something (pre-journal crash, manual surgery) left the base
          // absent with `.old` holding the only copy, RESTORE it — deleting
          // `.old` here would destroy the relation.
          if (!fs.exists(base) && fs.exists(old))
            require(fs.rename(old, base), s"recoverSwap: restore $old -> $base failed")
          fs.delete(new Path(s"$root/$rel.compacting"), true)
          fs.delete(old, true)
        }
        false
    }
  }

  /** ROLLBACK as a new commit (Delta RESTORE / Iceberg rollback
    * semantics): make the table's head equal its snapshot at
    * `toVersion` by COMMITTING the reverse delta — never by deleting
    * history. Keys changed since `toVersion` get their old payload
    * reasserted; keys created since get a tombstone; unchanged keys
    * don't appear (the commit is O(|diff|), not O(table)). Because
    * restore is itself a commit, it composes with everything else in
    * the family: time travel still reads the PRE-restore states (the
    * bad-ingest forensics), the change feed of the restore commit is
    * exactly the inverse of what it undoes, and a later
    * `compactVersions` retires the detour like any other history.
    * This is the "undo the bad ingest" lever a 100 TB table needs at
    * 3 a.m. — rebuild-free, audit-preserving, O(damage)-sized.
    *
    * Returns the new head version. Restoring TO the current head
    * commits an empty delta (harmless, explicit). */
  def restoreVersion(
      spark: SparkSession,
      path: String,
      toVersion: Long,
      keyCol: String): Long = {
    import org.apache.spark.sql.functions._
    val head = nextVersion(spark, path) - 1
    require(head >= 0, s"restoreVersion: no committed versions under $path")
    require(toVersion <= head,
      s"restoreVersion($toVersion): head is $head — cannot restore forward")
    val v = head + 1
    if (toVersion == head) {
      writeVersion(spark.read.parquet(s"$path/__v=$head").limit(0)
        .drop("__deleted"), path, v)
      return v
    }
    val diff = snapshotDiff(spark, path, toVersion, head, keyCol)
    val payload = diff.columns
      .filter(_.startsWith("old_")).map(_.stripPrefix("old_")).toSeq
    val reassert = diff.where(col("change") =!= "insert")
      .select(col(keyCol) +:
        payload.map(c => col(s"old_$c").as(c)) :+
        lit(false).as("__deleted"): _*)
    val tomb = diff.where(col("change") === "insert")
      .select(col(keyCol) +:
        payload.map(c => col(s"new_$c").as(c)) :+
        lit(true).as("__deleted"): _*)
    writeVersion(reassert.unionByName(tomb), path, v)
    v
  }

  /** Incremental materialized-view maintenance for distributive
    * group aggregates (count + sum) from a [[snapshotDiff]] change
    * feed — the pattern that keeps a 100 TB table's rollups fresh
    * WITHOUT re-aggregating the table: each changed key contributes
    * its new value to its new group and retracts its old value from
    * its old group, so inserts (no old side), deletes (no new side),
    * in-place updates, and GROUP MOVES (retract there, add here) are
    * all the same two-sided rule. The per-group delta folds into the
    * stored view with a full-outer merge; groups whose count reaches
    * zero leave the view (a re-appearing group re-enters through the
    * add side) — maintained state is bit-equal to a recompute over
    * the resolved head, which is exactly what the oracle checks.
    *
    * Scale shape: the change feed is already pruned to touched keys
    * (snapshotDiff's LeftSemi discipline); the delta agg is
    * map-combined to O(changed groups) rows and the merge joins two
    * O(groups) relations — per-cycle cost scales with the CHANGES and
    * the view, never the table.
    *
    * Contracts: `mv` has columns (grpCol, n_rows, sum_val) — the shape
    * this function itself returns, so cycles chain; the group column
    * is non-null in table data; `oldVal`/`newVal` are the SAME value
    * expression over the feed's `old_`/`new_`-prefixed payload. */
  def maintainAggView(
      mv: DataFrame,
      changes: DataFrame,
      grpCol: String,
      oldVal: Column,
      newVal: Column): DataFrame = {
    import org.apache.spark.sql.functions._
    require(mv.columns.toSeq == Seq(grpCol, "n_rows", "sum_val"),
      s"mv must be ($grpCol, n_rows, sum_val), got ${mv.columns.toSeq}")
    val adds = changes.where(col("change") =!= "delete")
      .select(col(s"new_$grpCol").as(grpCol),
        lit(1L).as("dn"), newVal.cast("long").as("dv"))
    val subs = changes.where(col("change") =!= "insert")
      .select(col(s"old_$grpCol").as(grpCol),
        lit(-1L).as("dn"), (-oldVal.cast("long")).as("dv"))
    val delta = adds.unionByName(subs)
      .groupBy(col(grpCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    mv.join(delta, Seq(grpCol), "full_outer")
      .select(col(grpCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) + coalesce(col("dv"), lit(0L))).as("sum_val"))
      .where(col("n_rows") > 0)
  }

  /** Fold commits 0..`upTo` into a single resolved base partition:
    * rewrites `__v=upTo` as the materialized snapshot and drops the
    * older directories (write-then-swap via a temp dir, so a crash
    * never leaves the table truncated). Reads at any `asOf >= upTo`
    * are unchanged; history BEFORE `upTo` is retired — the retention
    * trade every log-structured table format makes — and a read below
    * the horizon fails loud (`readSnapshotAt`/`snapshotDiff` check the
    * listing), never returns an empty snapshot. */
  def compactVersions(
      spark: SparkSession,
      path: String,
      upTo: Long,
      keyCol: String): Unit = {
    import org.apache.spark.sql.functions.lit
    val resolved = readSnapshotAt(spark, path, upTo, keyCol)
      .withColumn("__deleted", lit(false))
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.stripSuffix("/") + s".compacting_v$upTo")
    resolved.write.mode("overwrite").parquet(tmp.toString)
    fs.listStatus(root).map(_.getPath)
      .filter { p =>
        p.getName.startsWith("__v=") &&
          p.getName.stripPrefix("__v=").toLong <= upTo
      }
      .foreach(fs.delete(_, true))
    fs.rename(tmp, new Path(root, s"__v=$upTo"))
  }

  /** Persist a table bucketed (and sorted) by join/aggregation keys —
    * the layout a 100 TB deployment pre-materializes so repeated joins
    * and aggregations on those keys read co-located buckets and plan
    * ZERO shuffle exchanges (Spark reports the bucket spec as the
    * scan's output partitioning). `bucketBy` requires the session
    * catalog, so this writes a managed table under the warehouse dir
    * rather than a bare path; `BucketedJoinSpec` proves the
    * exchange-free plan. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keyCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Write hive-partitioned parquet (`path/col=value/…` directories) —
    * the directory layout that turns a predicate on the partition
    * column into LISTING-level pruning: a day filter over a
    * 100 TB/year events table reads 1/365th of the files, decided
    * before any footer is opened (`PartitionFilters` in the scan, vs
    * `PushedFilters` which still visits every file's stats). Partition
    * columns should be low-cardinality (directories are metadata). */
  def writeHivePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Compact a parquet directory to `targetFiles` files — the
    * small-file remedy: a streaming or per-batch ingest leaves
    * thousands of KB-sized files whose per-file open/footer/task cost
    * dominates scans; periodic compaction rewrites them into
    * scan-sized files. Round-robin repartition (no shuffle key needed
    * — data is reorganized, never changed). */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val tmp = path.stripSuffix("/") + ".compacting"
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
  }

  /** Morton (Z-order) interleave of two columns, each equal-width
    * bucketed into 2^`bitsPerCol` cells between its [lo, hi] bounds —
    * 2·bits codegen'd shift/mask ops, no UDF. Rows close in Z are
    * close in BOTH dimensions, so range-partitioning by Z gives every
    * output file a small (x, y) rectangle. */
  private[graft] def mortonCode(
      x: org.apache.spark.sql.Column, xLo: Double, xHi: Double,
      y: org.apache.spark.sql.Column, yLo: Double, yHi: Double,
      bitsPerCol: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bitsPerCol >= 1 && bitsPerCol <= 31, s"bitsPerCol out of range: $bitsPerCol")
    val cells = (1L << bitsPerCol) - 1
    def bucket(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(floor((c.cast("double") - lit(lo)) / lit((hi - lo) / (cells + 1))), lit(cells))
        .cast("long")
    val bx = bucket(x, xLo, xHi)
    val by = bucket(y, yLo, yHi)
    (0 until bitsPerCol).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(bx, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(by, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
  }

  /** Write parquet Z-ordered on two numeric columns — the multi-
    * dimensional pruning layout (Delta's OPTIMIZE ZORDER shape): sort
    * by one column and a predicate on the OTHER column prunes nothing;
    * sort by the Morton interleave and every file covers a small
    * rectangle in BOTH dimensions, so parquet min/max stats prune 2-D
    * box predicates file- and row-group-level. One min/max pass fixes
    * the bucket bounds; one range shuffle orders by Z. At 100 TB this
    * is the difference between scanning everything and scanning the
    * handful of files a (key range × time range) query touches. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      files: Int): Unit = {
    import org.apache.spark.sql.functions._
    val mm = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    val z = mortonCode(
      col(xCol), mm.getDouble(0), mm.getDouble(1),
      col(yCol), mm.getDouble(2), mm.getDouble(3))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Sharded training-data export: the corpus lands as `numShards`
    * hive `__shard=N` directories plus an on-disk manifest — the
    * layout a training loader consumes (shard = unit of shuffle-
    * buffer granularity and of resumable download). Shard assignment
    * is the engine-independent md5-60-bit uniform every sampling
    * query uses (`Sampling.md5Hash % numShards`) — deterministic
    * across runs/engines, uniform regardless of id clustering, and
    * source-interleaved for free (a hash ignores source order, so
    * every shard sees the full source mix — no sorted-corpus
    * monoculture shards). Cost: ONE shuffle on the shard id (uniform
    * by construction — no salt needed), one write; the manifest
    * re-reads only the written files column-pruned to the shard id +
    * size column. Callers size `numShards` so a shard is a few GB at
    * the target corpus. */
  def writeShards(
      df: DataFrame,
      path: String,
      idCol: String,
      numShards: Int,
      sizeExpr: Column): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    import org.apache.spark.sql.functions._
    val sharded = df.withColumn("__shard",
      pmod(graft.ext.Sampling.md5Hash(col(idCol)), lit(numShards.toLong)))
    sharded.repartition(numShards, col("__shard"))
      .write.mode("overwrite").partitionBy("__shard").parquet(path + "/data")
    val manifest = df.sparkSession.read.parquet(path + "/data")
      .groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(sizeExpr).as("n_bytes"))
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "/manifest")
  }

  def readShardManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/manifest")

  def readShard(spark: SparkSession, path: String, shard: Long): DataFrame =
    // partition pruning on the hive directory — a loader fetching one
    // shard lists and reads ONLY that directory's files
    spark.read.parquet(path + "/data")
      .where(org.apache.spark.sql.functions.col("__shard") === shard)

  /** Schema-evolution append: batches whose column sets drift over
    * time land in ONE parquet table without rewrites — each append is
    * O(batch) and never touches earlier files (the reference fixes one
    * record schema per job binary; a corpus that accretes columns over
    * months needs the table to absorb that). Parquet is self-
    * describing per file, so an appended batch simply carries its own
    * schema; reconciliation is deferred to read time. Callers gate the
    * append with [[graft.ops.Constraints.schemaDrift]] so a RETYPED
    * column — the one drift parquet cannot reconcile — fails loud at
    * write time, not as a read-time merge error months later. */
  def appendEvolved(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Union-by-name read over every schema era: `mergeSchema` unions
    * the per-file footers (absent columns null-fill). Cost is one
    * metadata pass over FOOTERS — O(#files), distributed by Spark —
    * never the data bytes; at 100 TB the footer pass is bounded by
    * compaction keeping file count sane, and a caller that already
    * knows the target schema skips it entirely via
    * `spark.read.schema(known).parquet(path)` (per-file pushdown
    * still prunes columns each era actually stores). */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC — the other columnar interchange format Spark ships a native
    * vectorized reader for; schema travels in the file (no inference
    * on read-back, unlike CSV/JSON). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
