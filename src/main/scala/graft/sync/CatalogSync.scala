package graft.sync

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.operators.GraftTable

/** S5 — catalog sync. The reference hive-syncs every table after each
  * commit so the curated zone is queryable by name through Glue
  * (handler.py:78-80,104,118). Spark-native, two modes:
  *
  *  - [[sync]] (fast path): the snapshot registered as session-local and
  *    global temp views — zero I/O, scoped to the application.
  *  - [[syncPersistent]]: a metastore-backed external parquet table. The
  *    manifest's live file list is materialized as a directory of hard
  *    links (the symlink-manifest pattern Hudi/Delta use to expose
  *    manifest-driven snapshots to Presto/Athena/Glue — a path-based
  *    external table over the data dirs would wrongly also scan files
  *    from older commits still awaiting cleaning), and the catalog entry
  *    is repointed at it on every commit. Any session sharing the
  *    metastore — `spark.newSession()` here, Hive/Glue on a cluster —
  *    reads the current snapshot BY NAME with full pushdown, with no
  *    temp-view registration and no knowledge of the engine. Like Hudi's
  *    hive-synced tables (`_hoodie_*`), graft's meta columns are visible
  *    in the catalog entry; the snapshot is the read-optimized view
  *    (compact() first for MOR tables with outstanding logs).
  */
object CatalogSync {
  def viewName(database: String, tableName: String): String =
    s"${database}_$tableName"

  /** Register/refresh the catalog entry for a table's current snapshot. */
  def sync(spark: SparkSession, database: String, tableName: String,
      table: GraftTable): String = {
    val name = viewName(database, tableName)
    val snapshot = table.readUser()
    snapshot.createOrReplaceTempView(name)
    snapshot.createOrReplaceGlobalTempView(name)
    name
  }

  /** MOR dual-view sync (the Hudi hive-sync shape, handler.py:78-80):
    * registers BOTH `<name>_ro` (read-optimized — base files only, cheap
    * and possibly stale) and `<name>_rt` (realtime — merge-on-read
    * snapshot) for the same table, exactly like Hudi's `_ro`/`_rt`
    * catalog pair for MERGE_ON_READ tables. On a COW table the two views
    * are identical by construction. Returns (roName, rtName).
    */
  def syncMor(spark: SparkSession, database: String, tableName: String,
      table: GraftTable): (String, String) = {
    val ro = viewName(database, tableName) + "_ro"
    val rt = viewName(database, tableName) + "_rt"
    val roView = table.readOptimized().drop(graft.model.Meta.RecordKey,
      graft.model.Meta.CommitSeq)
    roView.createOrReplaceTempView(ro)
    roView.createOrReplaceGlobalTempView(ro)
    val rtView = table.readUser()
    rtView.createOrReplaceTempView(rt)
    rtView.createOrReplaceGlobalTempView(rt)
    (ro, rt)
  }

  /** Persistent metastore sync of the latest commit: hard-link snapshot
    * dir + external table `database.tableName`. Returns the qualified
    * table name. Snapshot dirs are kept for the current and previous
    * commit (readers mid-scan on the prior snapshot keep working — the
    * same window cleaning gives the data files themselves).
    */
  def syncPersistent(spark: SparkSession, database: String, tableName: String,
      table: GraftTable): String = {
    val commit = table.latestCommit().getOrElse(
      throw new IllegalStateException(s"no commits at ${table.root}"))
    require(commit.logFiles.isEmpty,
      "persistent sync exposes the read-optimized view: compact() MOR logs first")
    val syncRoot = Paths.get(table.root, "_graft", "sync")
    val snapDir = syncRoot.resolve(s"snapshot-c${commit.seq}")
    if (!Files.exists(snapDir)) {
      // build under a writer-unique tmp name, publish with an atomic move:
      // a concurrent reader never sees a half-linked snapshot
      val tmp = syncRoot.resolve(s".snapshot-c${commit.seq}-${java.util.UUID.randomUUID()}")
      Files.createDirectories(tmp)
      commit.files.foreach { f =>
        // drop the data/c<seq> prefix, keep hive partition subdirs; part
        // file names carry write-UUIDs so cross-commit names never collide
        val rel = f.path.split("/").drop(2).mkString("/")
        val target = tmp.resolve(rel)
        Files.createDirectories(target.getParent)
        Files.createLink(target, Paths.get(table.root, f.path))
      }
      // losing a concurrent publish race surfaces differently by platform:
      // FileAlreadyExistsException, or (Linux, non-empty target dir)
      // DirectoryNotEmptyException/FileSystemException — any of them with the
      // snapshot already published means we lost cleanly; clean our tmp
      try Files.move(tmp, snapDir, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          deleteTree(tmp)
          if (!Files.exists(snapDir)) throw e
      }
    }
    // retire snapshots older than the previous commit
    if (Files.exists(syncRoot)) {
      val live = Set(s"snapshot-c${commit.seq}", s"snapshot-c${commit.seq - 1}")
      Files.list(syncRoot).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("snapshot-c") && !live(n)) deleteTree(p)
      }
    }
    val qualified = s"$database.$tableName"
    // explicit db location: external tables never write there, but the
    // default would drop a spark-warehouse dir into the process cwd
    if (!spark.catalog.databaseExists(database))
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $database " +
        s"LOCATION '${Files.createTempDirectory(s"graft-db-$database")}'")
    val schema = org.apache.spark.sql.types.DataType.fromJson(commit.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // Hive-sync semantics: if the entry already exists with the current
    // schema, repoint it in place (ALTER SET LOCATION + per-partition
    // add/update/drop) so concurrent readers never see 'table not found';
    // drop+recreate only on schema evolution (rare, and the reference's
    // hive-sync re-creates there too).
    // "same" must cover the partition LAYOUT too, not just the column set:
    // an entry partitioned differently than table.partitionFields would
    // either throw on SHOW PARTITIONS (now unpartitioned) or keep stale
    // partition metadata pointing at retired snapshot dirs
    val sameSchema = spark.catalog.tableExists(qualified) &&
      (try {
        val catalogPartCols = spark.catalog.listColumns(qualified).collect()
          .filter(_.isPartition).map(_.name).toSeq
        spark.table(qualified).schema.fields.map(f => (f.name, f.dataType)).toSet ==
          schema.fields.map(f => (f.name, f.dataType)).toSet &&
          catalogPartCols == table.partitionFields
      } catch { case _: Exception => false })
    if (sameSchema) {
      spark.sql(s"ALTER TABLE $qualified SET LOCATION '$snapDir'")
      if (table.partitionFields.nonEmpty) {
        val desired = listPartitionDirs(snapDir, table.partitionFields.size)
        val current = spark.sql(s"SHOW PARTITIONS $qualified")
          .collect().map(_.getString(0)).toSet
        desired.foreach { case (spec, loc) =>
          val sql = specToSql(spec)
          // ADD covers new partitions; SET LOCATION repoints ones carried
          // over from the previous snapshot dir
          spark.sql(s"ALTER TABLE $qualified ADD IF NOT EXISTS PARTITION ($sql) LOCATION '$loc'")
          spark.sql(s"ALTER TABLE $qualified PARTITION ($sql) SET LOCATION '$loc'")
        }
        (current -- desired.keySet).foreach { spec =>
          spark.sql(s"ALTER TABLE $qualified DROP IF EXISTS PARTITION (${specToSql(spec)})")
        }
      }
    } else {
      spark.sql(s"DROP TABLE IF EXISTS $qualified")
      if (table.partitionFields.isEmpty) {
        spark.catalog.createTable(qualified, "parquet", Map("path" -> snapDir.toString))
      } else {
        // partitioned external table: explicit DDL from the manifest schema
        // (partition values live in directory names, not in the files), then
        // recover partitions into the metastore — the MSCK step of a hive sync
        val ddl = schema.fields
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(
          s"""CREATE TABLE $qualified ($ddl) USING parquet
              PARTITIONED BY (${table.partitionFields.map(p => s"`$p`").mkString(", ")})
              LOCATION '$snapDir'""")
        spark.sql(s"ALTER TABLE $qualified RECOVER PARTITIONS")
      }
    }
    spark.catalog.refreshTable(qualified)
    qualified
  }

  /** Hive-style partition dirs exactly `depth` levels under `root`:
    * spec string ("p=v/q=w") -> absolute dir. */
  private def listPartitionDirs(root: Path, depth: Int): Map[String, Path] = {
    def walk(dir: Path, level: Int): Seq[(String, Path)] =
      if (level == 0) Seq(root.relativize(dir).toString -> dir)
      else {
        val stream = Files.list(dir)
        try stream.iterator().asScala.toSeq // materialize before closing
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
          .flatMap(walk(_, level - 1))
        finally stream.close()
      }
    walk(root, depth).toMap
  }

  /** "p=v1/q=v2" (hive-escaped dir names) -> SQL partition spec
    * `p='v1', q='v2'`. Backslashes must be escaped BEFORE quote-doubling:
    * Spark's default string parser treats `\` as an escape char, so a raw
    * backslash in a partition value (hive-escaped %5C on disk) would
    * otherwise parse into a different value or a syntax error. */
  private def specToSql(spec: String): String =
    spec.split("/").map { seg =>
      val i = seg.indexOf('=')
      val (k, v) = (seg.substring(0, i), unescapePath(seg.substring(i + 1)))
      s"`$k`='${v.replace("\\", "\\\\").replace("'", "''")}'"
    }.mkString(", ")

  /** Reverse hive path escaping (%XX sequences). */
  private def unescapePath(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length)
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3
        } catch { case _: NumberFormatException => sb.append(s.charAt(i)); i += 1 }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def deleteTree(p: Path): Unit = graft.util.Fs.deleteRecursively(p)
}
