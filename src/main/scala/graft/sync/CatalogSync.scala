package graft.sync

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
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
      try Files.move(tmp, snapDir, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => deleteTree(tmp) }
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
    // repoint = drop + recreate: the entry is pure metadata (external), so
    // recreation is cheap and leaves the files untouched
    spark.sql(s"DROP TABLE IF EXISTS $qualified")
    if (table.partitionFields.isEmpty) {
      spark.catalog.createTable(qualified, "parquet", Map("path" -> snapDir.toString))
    } else {
      // partitioned external table: explicit DDL from the manifest schema
      // (partition values live in directory names, not in the files), then
      // recover partitions into the metastore — the MSCK step of a hive sync
      val schema = org.apache.spark.sql.types.DataType.fromJson(commit.schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val ddl = schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(
        s"""CREATE TABLE $qualified ($ddl) USING parquet
            PARTITIONED BY (${table.partitionFields.map(p => s"`$p`").mkString(", ")})
            LOCATION '$snapDir'""")
      spark.sql(s"ALTER TABLE $qualified RECOVER PARTITIONS")
    }
    spark.catalog.refreshTable(qualified)
    qualified
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
}
