package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}

/** YAML sync configuration model + parsing, and the derived artifacts:
  * the sync routing matrix and trigger/sys-table DDL specs.
  *
  * Reference semantics: `config/ConfigParser.scala` + `ConfigObjects
  * .scala` (sys/db/sync config model), `dbopt/PgOperation.scala:116-214`
  * (per-table insert/update/delete trigger DDL generation),
  * `init/DatabaseInitializer.scala` (sys-table DDL). The DDL text here
  * is our own template, generated deterministically per sync entry.
  */
case class SysConfig(partition: Int, batch: Int, maxRetry: Int,
                     dataKeepHours: Int, maxPollWait: Int)
case class DbConfig(name: String, `type`: String, sysSchema: String)
case class SyncConfig(sourceDb: String, targetDb: String,
                      sourceSchema: String, sourceTable: String,
                      sourceKeys: String)
case class RootConfig(sys: SysConfig, dbs: List[DbConfig],
                      sync: List[SyncConfig])

object SyncConfigs {
  /** Demo config mirroring the shape of the reference's app-demo.yaml
    * (our own content, over the driver test tables). */
  val DemoYaml: String =
    """sys:
      |  partition: 16
      |  batch: 500
      |  maxRetry: 3
      |  dataKeepHours: 72
      |  maxPollWait: 10000
      |dbs:
      |  - {name: db0, type: postgresql, sysSchema: dbsync}
      |  - {name: db1, type: mysql, sysSchema: dbsync}
      |  - {name: db2, type: greenplum, sysSchema: dbsync}
      |sync:
      |  - {sourceDb: db0, targetDb: "db1,db2", sourceSchema: public, sourceTable: customer, sourceKeys: c_custkey}
      |  - {sourceDb: db0, targetDb: db1, sourceSchema: public, sourceTable: orders, sourceKeys: o_orderkey}
      |  - {sourceDb: db1, targetDb: db2, sourceSchema: public, sourceTable: lineitem, sourceKeys: "l_orderkey,l_linenumber"}
      |""".stripMargin

  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper(new YAMLFactory())
    m.registerModule(DefaultScalaModule)
    m
  }

  def parse(yaml: String): RootConfig = {
    val cfg = mapper.readValue(yaml, classOf[RootConfig])
    // jackson defaults missing primitives to 0/null — reject instead of
    // letting a typo'd key plan zero partitions downstream
    require(cfg.sys != null && cfg.sys.partition > 0, "sys.partition must be > 0")
    require(cfg.sys.batch > 0, "sys.batch must be > 0")
    require(cfg.dbs != null && cfg.dbs.nonEmpty && cfg.dbs.forall(d =>
      d.name != null && d.`type` != null), "dbs must be nonempty with name/type")
    require(cfg.sync != null && cfg.sync.forall(s =>
      s.sourceDb != null && s.targetDb != null && s.sourceTable != null &&
        s.sourceKeys != null), "sync entries need sourceDb/targetDb/table/keys")
    cfg
  }

  /** Sync routing matrix: one row per (sync entry, target db) — the
    * fan-out form the pollers route on. */
  def configMatrix(spark: SparkSession, yaml: String = DemoYaml): DataFrame = {
    import spark.implicits._
    val cfg = parse(yaml)
    val rows = for {
      sc <- cfg.sync
      tgt <- sc.targetDb.split(",").toList
    } yield (sc.sourceDb, tgt.trim, sc.sourceSchema, sc.sourceTable,
      sc.sourceKeys, cfg.sys.partition.toLong)
    rows.toDF("source_db", "target_db", "schema_name", "table_name",
      "sync_keys", "n_partitions")
  }

  /** System-table DDL for one database — the bootstrap the reference's
    * `init/DatabaseInitializer.scala` performs: the change-capture table
    * the triggers write to, the polled-offset table, and the ack/status
    * ledger. Our own DDL text, same information content. */
  def sysTableDdl(sysSchema: String): Seq[String] = Seq(
    s"CREATE SCHEMA IF NOT EXISTS $sysSchema",
    s"""CREATE TABLE IF NOT EXISTS $sysSchema.sync_data (
       |  id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
       |  source_db VARCHAR NOT NULL, target_db VARCHAR NOT NULL,
       |  schema_name VARCHAR NOT NULL, table_name VARCHAR NOT NULL,
       |  operation CHAR(1) NOT NULL CHECK (operation IN ('I','U','D')),
       |  data TEXT NOT NULL, create_time TIMESTAMP DEFAULT now())""".stripMargin,
    s"CREATE TABLE IF NOT EXISTS $sysSchema.sync_polled (data_id BIGINT PRIMARY KEY)",
    s"""CREATE TABLE IF NOT EXISTS $sysSchema.sync_data_status (
       |  data_id BIGINT PRIMARY KEY, status VARCHAR NOT NULL,
       |  message TEXT, retry INT DEFAULT 0)""".stripMargin,
    s"CREATE INDEX IF NOT EXISTS idx_sync_data_time ON $sysSchema.sync_data (create_time)")

  /** Trigger DDL spec rows: one per (sync entry, I/U/D op). Pure —
    * the DataFrame AND the DuckDB oracle VALUES literal both derive
    * from this, so they cannot drift. */
  def triggerSpecRows(yaml: String = DemoYaml):
      Seq[(String, String, String, String, String, String, String)] = {
    val cfg = parse(yaml)
    val ops = List("insert" -> "I", "update" -> "U", "delete" -> "D")
    for {
      sc <- cfg.sync
      (opName, opCode) <- ops
    } yield {
      val trigger = s"sync_${opName}_trigger"
      val fn = s"sync_${sc.sourceTable}_$opName"
      val payload = if (opCode == "D") "OLD" else "NEW"
      val ddl =
        s"CREATE TRIGGER $trigger AFTER ${opName.toUpperCase(java.util.Locale.ROOT)} ON " +
          s"${sc.sourceSchema}.${sc.sourceTable} FOR EACH ROW EXECUTE " +
          s"$fn() -- writes (sourceDb=${sc.sourceDb}, op=$opCode, " +
          s"data=row_to_json($payload)) to dbsync.sync_data for targets ${sc.targetDb}"
      (sc.sourceDb, sc.sourceSchema, sc.sourceTable, opCode, trigger, fn, ddl)
    }
  }

  /** Trigger DDL specs as a DataFrame — our own DDL dialect, same
    * information content as the reference's trigger templates. */
  def triggerSpecs(spark: SparkSession, yaml: String = DemoYaml): DataFrame = {
    import spark.implicits._
    triggerSpecRows(yaml).toDF("source_db", "schema_name", "table_name",
      "op", "trigger_name", "function_name", "ddl")
  }
}
