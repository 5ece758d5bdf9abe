package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Iceberg-SHAPED table layer over partitioned Parquet.
  *
  * No Iceberg/Delta jars ship in this environment (coursier is offline), so
  * this implements the Iceberg table *shape* — immutable data files, manifest
  * JSON per snapshot, an atomically-swapped current-version pointer,
  * snapshot lineage (parent ids), per-partition row counts, and a config
  * fingerprint for cache invalidation — behind a narrow interface so a real
  * Iceberg catalog slots in unchanged (`SELECT ... FROM cat.db.t` replaces
  * `store.read(spark)`, `MERGE INTO`/append replaces `store.append`).
  *
  * This is the analog of the reference's SQLite cache.db (db.cpp:14,38-47):
  * read-before-compute / write-after-compute, keyed by content identity,
  * stamped with a version for compatibility (db.cpp:46-47; readme.md:80).
  *
  * Layout:
  *   root/data/snap-<id>/part_id=<p>/ ... .parquet   (immutable per snapshot)
  *   root/metadata/v<N>.json                     (manifest: files + lineage)
  *   root/metadata/current.json                  (atomic pointer {version})
  */
object IcebergShaped {

  final case class FileEntry(path: String, partId: Int, rows: Long)
  final case class Snapshot(
      snapshotId: Long,
      parentId: Option[Long],
      // the parent's manifest VERSION: the chain walk follows this, so a
      // commit on top of a rollback branches correctly instead of walking
      // version-1 through abandoned snapshots (None in pre-branching
      // manifests -> the walk falls back to version-1, their linear truth)
      parentVersion: Option[Int] = None,
      version: Int,
      configFp: String,
      operation: String, // append | overwrite
      addedRows: Long,
      totalRows: Long,
      files: List[FileEntry])

  implicit private val fmts: Formats = DefaultFormats

  final class Table(val root: String) {
    private def metaDir: Path = Paths.get(root, "metadata")
    private def currentPath: Path = metaDir.resolve("current.json")

    def currentVersion: Option[Int] =
      if (!Files.exists(currentPath)) None
      else Some((JsonMethods.parse(Files.readString(currentPath)) \ "version").extract[Int])

    def snapshotAt(version: Int): Snapshot =
      Serialization.read[Snapshot](Files.readString(metaDir.resolve(s"v$version.json")))

    def currentSnapshot: Option[Snapshot] = currentVersion.map(snapshotAt)

    /** Live data files TAGGED with the snapshot that added each (the chain
      * walk follows parentVersion — see Snapshot). */
    def liveFilesTagged: List[(Snapshot, FileEntry)] = {
      def chain(sn: Snapshot): List[(Snapshot, FileEntry)] = sn.parentId match {
        case Some(_) if sn.operation != "overwrite" =>
          chain(snapshotAt(sn.parentVersion.getOrElse(sn.version - 1))) ++
            sn.files.map((sn, _))
        case _ => sn.files.map((sn, _))
      }
      currentSnapshot match {
        case None => Nil
        case Some(s) if s.operation == "overwrite" => s.files.map((s, _))
        case Some(s) => chain(s)
      }
    }

    /** All live data files = union over the snapshot chain (append log). */
    def liveFiles: List[FileEntry] = liveFilesTagged.map(_._2)

    def isEmpty: Boolean = liveFiles.isEmpty

    /** Read the live table (empty DataFrame with no schema is the caller's
      * problem — use isEmpty first). Live files are part_id=N leaf dirs;
      * they are read grouped under their snap-<id> base dir with an explicit
      * basePath so partition discovery RETAINS the part_id column (without
      * it Spark treats each leaf as a root and drops the partition column,
      * which would break commit()'s part_id requirement on read-modify-write
      * paths like delete()). */
    def read(spark: SparkSession): DataFrame = {
      val files = liveFiles
      require(files.nonEmpty, s"store at $root is empty")
      files.groupBy(f => Paths.get(f.path).getParent.toString).toSeq.sortBy(_._1)
        .map { case (base, fs) =>
          spark.read.option("basePath", base).parquet(fs.map(_.path): _*)
        }
        // allowMissingColumns: one store may hold snapshots of BOTH payload
        // schemas (mode-pruned rows lack shingles_head/tail/ss_keys) when
        // configs with different payload markers share it — absent columns
        // read as null, and the caller's config_fp filter keeps only rows
        // whose schema is complete for that config
        .reduce(_.unionByName(_, allowMissingColumns = true))
    }

    /** Per-partition lineage of the current snapshot chain: rows per part_id
      * per snapshot file, stamped with the snapshot that ADDED the file
      * (not the current pointer) — the north-rule "per-partition lineage"
      * surface answers "which snapshot introduced this file". */
    def lineage(spark: SparkSession): DataFrame = {
      import spark.implicits._
      liveFilesTagged.map { case (sn, f) => (sn.snapshotId, f.partId, f.path, f.rows) }
        .toDF("snapshot_id", "part_id", "file", "rows")
    }

    /** Commit `df` (must contain part_id) as a new snapshot. Write-then-swap:
      * data lands under a snapshot-scoped dir, the manifest is written, and
      * current.json is atomically moved into place last — a crash before the
      * swap leaves the old version live (checkpointed resume). */
    def commit(df: DataFrame, configFp: String, operation: String = "append"): Snapshot = {
      require(df.columns.contains("part_id"), "store tables are partitioned by part_id")
      Files.createDirectories(metaDir)
      val prev = currentSnapshot
      // next FREE version, not current+1: after rollback(v) the pointer sits
      // below existing manifests, and current+1 would re-derive an existing
      // snapshotId — SaveMode.Overwrite would then wipe an "immutable" data
      // dir that later manifests still reference. Branch commits get a fresh
      // version; the chain walks parentVersion, so abandoned branches stay
      // intact for time travel.
      val version = {
        val existing = {
          val ms = Files.list(metaDir)
          try {
            import scala.jdk.CollectionConverters._
            ms.iterator().asScala.map(_.getFileName.toString)
              .collect { case n if n.matches("v\\d+\\.json") =>
                n.stripPrefix("v").stripSuffix(".json").toInt }
              .maxOption.getOrElse(-1)
          } finally ms.close()
        }
        existing + 1
      }
      val snapshotId = math.abs(
        graft.core.XXH64.hashString(s"$root#$version", 42L)) | 1L
      val dataDir = Paths.get(root, "data", s"snap-$snapshotId")

      // Per-partition row counts come from TASK-COMMIT MESSAGES, not a
      // driver-side re-read of the written data (the Iceberg DataWriter
      // commit-message shape): each write task counts (part_id -> rows) as
      // the writer consumes its iterator and reports on exhaustion via an
      // accumulator — accumulator updates ride the task-completion RPC, i.e.
      // the task's commit message. A failed/killed attempt never exhausts its
      // iterator (no report); a speculative duplicate reports identical
      // counts and is deduped by task partition id below. One pass over the
      // data total — the old path scanned everything a second time just to
      // rebuild counts the tasks already knew.
      val spark = df.sparkSession
      val reports = spark.sparkContext
        .collectionAccumulator[(Int, Int, Long)]("graft.commit.taskReports")
      val partIdIdx = df.schema.fieldIndex("part_id")
      val counted = df.mapPartitions { it =>
        val taskPart = org.apache.spark.TaskContext.getPartitionId()
        val local = scala.collection.mutable.HashMap.empty[Int, Long]
        var reported = false
        new Iterator[org.apache.spark.sql.Row] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !reported) {
              reported = true
              local.foreach { case (p, n) => reports.add((taskPart, p, n)) }
            }
            h
          }
          def next(): org.apache.spark.sql.Row = {
            val r = it.next()
            val p = r.getInt(partIdIdx)
            local.update(p, local.getOrElse(p, 0L) + 1L)
            r
          }
        }
      }(org.apache.spark.sql.Encoders.row(df.schema))

      counted.write.mode(SaveMode.Overwrite).partitionBy("part_id")
        .parquet(dataDir.toString)

      val counts: Map[Int, Long] = {
        import scala.jdk.CollectionConverters._
        reports.value.asScala
          .groupBy(t => (t._1, t._2)).map(_._2.head) // dedupe retried attempts
          .groupBy(_._2).map { case (p, ts) => p -> ts.map(_._3).sum }
      }
      // manifest file entries: one shallow metadata listing for the committed
      // part_id=N paths (the committer names them); rows come from the task
      // reports above. A real Iceberg catalog gets paths AND counts from the
      // DataWriter commit messages — this is that seam minus the renamed
      // paths, with zero data re-read either way.
      val files: List[FileEntry] = {
        val dirStream = Files.list(dataDir)
        try {
          import scala.jdk.CollectionConverters._
          dirStream.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("part_id="))
            .map { p =>
              val partId = p.getFileName.toString.stripPrefix("part_id=").toInt
              FileEntry(p.toString, partId, counts.getOrElse(partId, 0L))
            }.toList.sortBy(_.partId)
        } finally dirStream.close()
      }
      val added = files.map(_.rows).sum
      val total = (if (operation == "overwrite") 0L
                   else prev.map(_.totalRows).getOrElse(0L)) + added
      val snap = Snapshot(snapshotId, prev.map(_.snapshotId), prev.map(_.version),
        version, configFp, operation, added, total, files)

      Files.writeString(metaDir.resolve(s"v$version.json"), Serialization.write(snap))
      val tmp = metaDir.resolve(s"current.json.tmp$version")
      Files.writeString(tmp, s"""{"version":$version}""")
      Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      snap
    }

    /** Snapshot-level delete (SURVEY S9 — the reference's cache invalidation,
      * db.cpp:99-117): rows matching `condition` are removed by committing an
      * overwrite snapshot of the filtered live table. The input files stay
      * immutable; time travel to the pre-delete version still works. */
    def delete(spark: SparkSession, condition: org.apache.spark.sql.Column): Snapshot = {
      // SQL DELETE semantics: remove rows where the condition is TRUE; rows
      // where it evaluates to NULL (e.g. a null column in the predicate) are
      // KEPT — a bare !condition would silently delete them too
      val remaining = read(spark).filter(!coalesce(condition, lit(false)))
      commit(remaining, currentSnapshot.map(_.configFp).getOrElse(""), "overwrite")
    }

    /** Writer hygiene (SURVEY S15 — the reference's temp-file GC,
      * mainwindow.cpp:53-64): remove data/snap-* directories not referenced
      * by ANY manifest (debris from crashed commits). Returns removed paths. */
    def gcOrphans(): Seq[String] = {
      val dataRoot = Paths.get(root, "data")
      if (!Files.exists(dataRoot) || !Files.exists(metaDir)) return Nil
      import scala.jdk.CollectionConverters._
      // compare by snap-* DIRECTORY NAME, never by raw path string: manifest
      // paths are recorded with whatever root spelling committed them, and a
      // GC run opening the same table via './store', an absolute path, or a
      // different cwd would see zero string matches and delete every LIVE
      // snapshot (round-5 review). Names are unique per table (snapshotId =
      // XXH64(root#version), stamped at commit), so name identity is exact.
      // The snap dir is the PARENT of each file entry (every entry is
      // <snapDir>/part_id=N) — never "the first snap- segment in the path",
      // which a table root like /backups/snap-archive/store would poison,
      // marking every real snapshot unreferenced.
      val referenced: Set[String] = {
        val ms = Files.list(metaDir)
        try ms.iterator().asScala
          .filter(_.getFileName.toString.matches("v\\d+\\.json"))
          .flatMap { m =>
            Serialization.read[Snapshot](Files.readString(m)).files
              .flatMap(f => Option(Paths.get(f.path).getParent)
                .map(_.getFileName.toString).filter(_.startsWith("snap-")))
          }.toSet
        finally ms.close()
      }
      val ds = Files.list(dataRoot)
      val orphans =
        try ds.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("snap-"))
          .filter(p => !referenced.contains(p.getFileName.toString))
          .map(_.toString).toList
        finally ds.close()
      orphans.foreach { dir =>
        Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
      orphans
    }

    /** Time-travel the pointer back to an earlier version (snapshot files are
      * immutable, so this is metadata-only — the Iceberg rollback shape). */
    def rollback(version: Int): Unit = {
      require(Files.exists(metaDir.resolve(s"v$version.json")), s"no snapshot v$version")
      val tmp = metaDir.resolve(s"current.json.tmprb")
      Files.writeString(tmp, s"""{"version":$version}""")
      Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def table(root: String): Table = new Table(root)
}
