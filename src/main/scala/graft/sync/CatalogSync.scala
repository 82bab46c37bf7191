package graft.sync

import org.apache.spark.sql.SparkSession
import graft.operators.GraftTable

/** S5 — catalog sync. The reference hive-syncs every table after each
  * commit so the curated zone is queryable by name through Glue
  * (handler.py:78-80,104,118). Spark-native: the snapshot is a manifest-
  * driven file list, so the catalog entry is a view over exactly the
  * manifest's live files — a path-based external table would wrongly
  * also scan files from older commits still awaiting cleaning.
  *
  * Registered twice: session-local (`<db>_<table>`) and global
  * (`global_temp.<db>_<table>`) so concurrent sessions of the same
  * application share it. On a persistent metastore (Hive/Glue) the same
  * hook issues CREATE/ALTER VIEW with the manifest file list.
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
}
