package graft.config

import java.nio.file.{Files, Paths}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-table ingest configuration — the Scala shape of the reference's
  * `table::<schema>.<table>` config items
  * (example-configs.json:33-153; field names kept 1:1 so a reference
  * user's config translates directly; munge rules of handler.py:21-63,
  * 66-122).
  */
case class TableConfig(
    name: String,                          // "public.customer"
    recordKey: Seq[String],                // record_key CSV (handler.py:76)
    sourceOrderingField: String,           // precombine field (handler.py:77)
    isPartitioned: Boolean,
    partitionPath: Seq[String],            // hive-style partition cols (handler.py:103)
    tableType: String,                     // COPY_ON_WRITE | MERGE_ON_READ (handler.py:112)
    compactEvery: Int,                     // MOR inline compaction cadence (handler.py:112-113)
    globalIndex: Boolean,                  // index scope (Hudi hoodie.index global/non-global analog)
    transformerSql: Option[String],        // TR0 hook (handler.py:115-116)
    enabled: Boolean,                      // P4 (handler.py:131)
    sparkConf: Map[String, String],
    statsColumns: Seq[String] = Seq.empty,  // column-stats index (data skipping)
    keyBlooms: Boolean = false,             // per-file record-key bloom index
    bloomColumns: Seq[String] = Seq.empty,  // per-column bloom index (secondary lookups)
    partialUpdate: Boolean = false,         // partial-image CDC merge payload
    clusterSmallFileBytes: Long = 0L,       // inline clustering threshold (handler.py:73,81)
    rliMaintain: Boolean = false,           // keep the record-level index current per commit
    bucketCount: Int = 0,                   // BUCKET index (hoodie.index.type=BUCKET analog)
    viewMaintain: Boolean = false,          // hands-free dependent-view refresh per commit
    viewMaintainAsync: Boolean = false) {   // async: commits mark, the run drains after ingest

  /** Curated table name `{identifier}_{schema}_{table}` (handler.py:132). */
  def curatedName(identifier: String): String =
    s"${identifier}_${name.replace(".", "_")}"

  /** Raw-zone subdir `<schema>/<table>` (handler.py:70 reads
    * `raw/<identifier>/<schema>/<table>/`). */
  def rawSubdir: String = name.replace(".", "/")
}

/** Pipeline-level configuration — the `pipeline::<type>` item plus the
  * engine-level knobs the reference spreads across handler.py and the
  * step function (emr1.json:28 step_parallelism, :150-157 retry,
  * :256-296 chaining; handler.py:90-93 cleaner/archival).
  */
case class PipelineConfig(
    identifier: String,
    pipelineType: String,                  // bulk_insert | delta | delta_continuous
    rawRoot: String,
    curatedRoot: String,
    database: String,
    stepParallelism: Int,
    retries: Int,
    cleanerCommitsRetained: Int,
    keepTimelineCommits: Int,
    nextPipeline: Option[String],
    sparkConf: Map[String, String],
    tables: Seq[TableConfig]) {

  /** P1/P4: enabled tables only. */
  def enabledTables: Seq[TableConfig] = tables.filter(_.enabled)
}

/** O1 — config fetch & munge. Loads a JSON file of config items in the
  * reference's DynamoDB-item shape (`config: "pipeline::…" | "table::…"`,
  * shared `identifier`) and assembles the PipelineConfig for a requested
  * pipeline type (handler.py:21-63).
  */
object ConfigLoader {
  implicit private val fmts: Formats = DefaultFormats

  def load(path: String, identifier: String, pipelineType: String): PipelineConfig =
    fromJson(Files.readString(Paths.get(path)), identifier, pipelineType)

  def fromJson(json: String, identifier: String, pipelineType: String): PipelineConfig = {
    val items = JsonMethods.parse(json).asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JObject])
      .filter(o => (o \ "identifier").extractOpt[String].contains(identifier))

    def str(o: JObject, k: String): Option[String] = (o \ k).extractOpt[String]

    val pipeItem = items.find(o => str(o, "config").contains(s"pipeline::$pipelineType"))
      .getOrElse(throw new IllegalArgumentException(
        s"no pipeline::$pipelineType item for identifier $identifier"))

    val tables = items.flatMap { o =>
      str(o, "config").filter(_.startsWith("table::")).map { cfg =>
        val hudi = (o \ "hudi_config").asInstanceOf[JObject]
        TableConfig(
          name = cfg.stripPrefix("table::"),
          recordKey = str(hudi, "record_key")
            .getOrElse(throw new IllegalArgumentException(s"$cfg: record_key required"))
            .split(",").map(_.trim).toSeq,
          sourceOrderingField = str(hudi, "source_ordering_field").getOrElse("trx_seq"),
          isPartitioned = (hudi \ "is_partitioned").extractOpt[Boolean].getOrElse(false),
          partitionPath = str(hudi, "partition_path").toSeq
            .flatMap(_.split(",").map(_.trim)),
          tableType = str(hudi, "table_type").getOrElse("COPY_ON_WRITE"),
          compactEvery = (hudi \ "compact_every").extractOpt[Int].getOrElse(3),
          globalIndex = (hudi \ "global_index").extractOpt[Boolean].getOrElse(true),
          transformerSql = str(hudi, "transformer_sql"),
          enabled = (o \ "enabled").extractOpt[Boolean].getOrElse(true),
          sparkConf = (o \ "spark_conf").extractOpt[Map[String, String]].getOrElse(Map.empty),
          statsColumns = str(hudi, "stats_columns").toSeq
            .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)),
          keyBlooms = (hudi \ "key_blooms").extractOpt[Boolean].getOrElse(false),
          bloomColumns = str(hudi, "bloom_columns").toSeq
            .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)),
          partialUpdate = (hudi \ "partial_update").extractOpt[Boolean].getOrElse(false),
          clusterSmallFileBytes =
            (hudi \ "cluster_small_file_bytes").extractOpt[Long].getOrElse(0L),
          rliMaintain = (hudi \ "rli_maintain").extractOpt[Boolean].getOrElse(false),
          bucketCount = (hudi \ "bucket_count").extractOpt[Int].getOrElse(0),
          // 'view_maintain' = true | false | "async" — same grammar as
          // the DDL TBLPROPERTIES key (GraftCatalog.createTable); any
          // other string refuses NAMING the key and value (a bare
          // toBoolean threw "For input string: ..." from deep inside
          // config loading — round-19 advice)
          viewMaintain = (hudi \ "view_maintain").extractOpt[String]
            .map(_.trim.toLowerCase match {
              case "async" | "true" => true
              case "false" => false
              case other => throw new IllegalArgumentException(
                s"$cfg: view_maintain must be true, false or " +
                  s"async (got '$other')")
            })
            .orElse((hudi \ "view_maintain").extractOpt[Boolean])
            .getOrElse(false),
          viewMaintainAsync = (hudi \ "view_maintain").extractOpt[String]
            .exists(_.trim.equalsIgnoreCase("async")))
      }
    }

    PipelineConfig(
      identifier = identifier,
      pipelineType = pipelineType,
      rawRoot = str(pipeItem, "raw_root")
        .getOrElse(throw new IllegalArgumentException("raw_root required")),
      curatedRoot = str(pipeItem, "curated_root")
        .getOrElse(throw new IllegalArgumentException("curated_root required")),
      database = str(pipeItem, "database").getOrElse("graft"),
      stepParallelism = (pipeItem \ "step_parallelism").extractOpt[Int].getOrElse(4),
      retries = (pipeItem \ "retries").extractOpt[Int].getOrElse(1),
      cleanerCommitsRetained = (pipeItem \ "cleaner_commits_retained").extractOpt[Int].getOrElse(5),
      keepTimelineCommits = (pipeItem \ "keep_timeline_commits").extractOpt[Int].getOrElse(10),
      nextPipeline = str(pipeItem, "next_pipeline"),
      sparkConf = (pipeItem \ "spark_conf").extractOpt[Map[String, String]].getOrElse(Map.empty),
      tables = tables)
  }
}
