package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The shared write-ahead JOURNAL of the table-backed stores
  * ([[graft.dedup.TableCommit]], [[graft.similarity.KnnStore]],
  * [[graft.similarity.PqStore]], [[graft.dedup.SentenceTable]]) — one
  * home for the two-phase-commit discipline they all follow:
  *
  *   - every fold/retract writes its per-table deltas to private
  *     `<table>/delta-g<gen>/b_<uuid>` dirs and COMMITS them with one
  *     atomic marker rename (`_batches/g<gen>/<uuid>.commit`, content =
  *     the table names written); reads union ONLY marked batches, so a
  *     crash mid-op leaves invisible garbage and replay heals;
  *   - a compaction writes a fresh GENERATION of baseline dirs and
  *     commits it with one atomic `_gens/g-<N>.commit` marker rename;
  *     reads are generation-scoped, so a crash on either side of the
  *     marker exposes exactly one complete generation.
  *
  * Markers rename-commit via the filesystem's atomic same-directory
  * rename (local POSIX and HDFS; an object store without atomic rename
  * needs a manifest service instead — documented limit). All path
  * probing goes through the session's Hadoop `FileSystem`, never
  * `java.nio`, so non-local base URIs resolve instead of silently
  * reading empty frames. */
private[graft] final class StoreJournal(spark: SparkSession, val base: String) {

  @transient private lazy val hconf = spark.sessionState.newHadoopConf()
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)
  private def fsOf(s: String) = hp(s).getFileSystem(hconf)

  def exists(path: String): Boolean = fsOf(path).exists(hp(path))

  def delete(path: String): Unit = {
    val fs = fsOf(path)
    if (fs.exists(hp(path))) fs.delete(hp(path), true)
  }

  /** (bytes, parquet-file count) under a path — driver-side metadata
    * only, no jobs. */
  def du(path: String): (Long, Long) = {
    val fs = fsOf(path)
    if (!fs.exists(hp(path))) (0L, 0L)
    else {
      var bytes = 0L; var files = 0L
      val it = fs.listFiles(hp(path), true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          bytes += f.getLen; files += 1
        }
      }
      (bytes, files)
    }
  }

  /** Atomic marker commit: write content to a `.tmp` sibling, rename to
    * the final name (same-directory rename — atomic on POSIX/HDFS). */
  private def commitMarker(dir: String, name: String, content: String): Unit = {
    val fs = fsOf(dir)
    fs.mkdirs(hp(dir))
    val tmp = hp(s"$dir/$name.tmp")
    val out = fs.create(tmp, true)
    out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (!fs.rename(tmp, hp(s"$dir/$name")))
      throw new java.io.IOException(s"marker rename failed: $dir/$name")
  }

  private def listMarkers(dir: String): Seq[(String, String)] = {
    val fs = fsOf(dir)
    if (!fs.exists(hp(dir))) Seq.empty
    else
      fs.listStatus(hp(dir)).toSeq
        .map(_.getPath)
        .filter(_.getName.endsWith(".commit"))
        .sortBy(_.getName)
        .map { q =>
          val in = fs.open(q)
          val content =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          (q.getName.stripSuffix(".commit"), content)
        }
  }

  private def gensDir = s"$base/_gens"
  private def batchesDir = s"$base/_batches/g$gen"

  /** Current committed generation of the store at `base`. */
  var gen: Int = 0
  /** Marked (committed) ops of the current generation, in marker order,
    * with the table names each wrote. */
  val committed =
    scala.collection.mutable.ArrayBuffer.empty[(String, Set[String])]

  reload()

  /** Re-resolve the journal from the filesystem — the reopen path (and
    * the constructor): current generation = max committed gen marker,
    * committed ops = that generation's batch markers. */
  def reload(): this.type = {
    val gens = listMarkers(gensDir).map(_._1.stripPrefix("g-").toInt)
    gen = if (gens.isEmpty) 0 else gens.max
    committed.clear()
    committed ++= listMarkers(batchesDir).map { case (u, c) =>
      (u, c.split("\n").filter(_.nonEmpty).toSet)
    }
    this
  }

  def newUuid(): String =
    java.util.UUID.randomUUID().toString.take(12)

  def batchPath(t: String, uuid: String): String =
    s"$base/$t/delta-g$gen/b_$uuid"

  /** The committed batch dirs holding table `t`, in commit order. */
  def deltaPaths(t: String): Seq[String] =
    committed.collect { case (u, ts) if ts(t) => batchPath(t, u) }.toSeq

  /** Commit one fold/retract: atomic marker rename, then track it. */
  def markBatch(uuid: String, tables: Set[String]): Unit = {
    commitMarker(batchesDir, s"$uuid.commit", tables.mkString("\n"))
    committed += ((uuid, tables))
  }

  /** Commit generation 0 — the deploy. */
  def markDeploy(): Unit = {
    commitMarker(gensDir, "g-00000.commit", "deploy")
    gen = 0
  }

  /** Commit generation `g2` — the compaction's atomic point. Driver
    * state does NOT advance here (the caller may crash-inject between
    * marker and advance); call [[advance]] after. */
  def markGeneration(g2: Int): Unit =
    commitMarker(gensDir, f"g-$g2%05d.commit", "compact")

  /** Flip the driver journal to generation `g2`. */
  def advance(g2: Int): Unit = {
    gen = g2
    committed.clear()
  }

  /** Best-effort GC of a superseded generation's batch markers. */
  def gcBatches(gOld: Int): Unit = delete(s"$base/_batches/g$gOld")

  def emptyOf(schema: StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  def readOr(path: String, schema: StructType): DataFrame =
    if (exists(path)) spark.read.schema(schema).parquet(path)
    else emptyOf(schema)

  /** The marked (journal-committed) delta batches of one table. */
  def readDelta(t: String, schema: StructType): DataFrame = {
    val paths = deltaPaths(t)
    if (paths.isEmpty) emptyOf(schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** Per-op delta write: ONE plain parquet file, invisible to reads
    * until the op's marker commits. */
  def writeBatch(df: DataFrame, t: String, uuid: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(batchPath(t, uuid))

  private def listChildDirs(path: String): Seq[String] = {
    val fs = fsOf(path)
    if (!fs.exists(hp(path))) Seq.empty
    else fs.listStatus(hp(path)).toSeq
      .filter(_.isDirectory).map(_.getPath.toString)
  }

  /** VACUUM — best-effort GC of journal garbage under `tables`:
    * unmarked batch dirs of the current generation (crashed mid-op
    * residue — their markers never committed, so reads never see them)
    * and every layer dir of a non-current generation (crashed- or
    * pre-GC-compaction residue). Never touches marked state of the
    * current generation, so it is a committed-face no-op by
    * construction (spec-pinned). Returns the number of directories
    * removed. Run it on the maintenance schedule alongside
    * compaction. */
  def vacuum(tables: Seq[String]): Long = {
    var removed = 0L
    val live = committed.map(_._1).toSet
    val genSuffix = s"-g$gen"
    for (t <- tables) {
      for (d <- listChildDirs(s"$base/$t")) {
        val name = d.substring(d.lastIndexOf('/') + 1)
        val isLayer = name.startsWith("corpus-g") || name.startsWith("delta-g")
        if (isLayer && !name.endsWith(genSuffix)) {
          delete(d); removed += 1
        }
      }
      for (d <- listChildDirs(s"$base/$t/delta$genSuffix")) {
        val name = d.substring(d.lastIndexOf('/') + 1)
        if (name.startsWith("b_") && !live.contains(name.stripPrefix("b_"))) {
          delete(d); removed += 1
        }
      }
    }
    for (d <- listChildDirs(s"$base/_batches")) {
      val name = d.substring(d.lastIndexOf('/') + 1)
      if (name != s"g$gen") { delete(d); removed += 1 }
    }
    removed
  }
}
