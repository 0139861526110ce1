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
                      sourceKeys: String,
                      insertCondition: String = null,
                      updateCondition: String = null,
                      deleteCondition: String = null) {
  /** Capture condition for one op code, defaulting to the always-true
    * guard when the config leaves the slot empty (the reference's
    * `insertCondition == null → "1=1"` rule, PgOperation.scala:142). */
  def conditionFor(opCode: String): String = Option(opCode match {
    case "I" => insertCondition
    case "U" => updateCondition
    case _   => deleteCondition
  }).getOrElse("1=1")
}
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
      |  - {sourceDb: db0, targetDb: db1, sourceSchema: public, sourceTable: orders, sourceKeys: o_orderkey, updateCondition: "NEW.o_orderstatus <> OLD.o_orderstatus"}
      |  - {sourceDb: db1, targetDb: db2, sourceSchema: public, sourceTable: orders, sourceKeys: o_orderkey}
      |  - {sourceDb: db1, targetDb: db2, sourceSchema: public, sourceTable: lineitem, sourceKeys: "l_orderkey,l_linenumber", insertCondition: "NEW.l_quantity > 0"}
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

  /** Greenplum sys bootstrap = the pg DDL plus the update-then-insert
    * upsert helper the sink routes through (classic greenplum has no
    * INSERT..ON CONFLICT — `dbopt/GpOperation.scala:47-94` installs
    * `public.gp_upsert`; DDL text here is our own condensed template,
    * same mechanism). */
  def sysTableDdl(sysSchema: String, dialect: String): Seq[String] =
    if (dialect == "greenplum")
      // When every column is a key there is nothing to update; the
      // function probes existence instead so the conditional INSERT at
      // the bottom stays correct. (Kept out of the DDL text itself so
      // emitted statements carry no comment markers at all.)
      sysTableDdl(sysSchema) :+
        """CREATE OR REPLACE FUNCTION public.gp_upsert(
          |  nsp name, tbl name, keys text[], content json)
          |RETURNS int LANGUAGE plpgsql STRICT AS $fn$
          |DECLARE
          |  k text; v text; n int := 0;
          |  upd text := ''; cond text := ''; icols text := ''; ivals text := '';
          |BEGIN
          |  FOR k, v IN SELECT * FROM json_each_text(content) LOOP
          |    IF k = ANY(keys) THEN
          |      cond := cond || format(' AND %I = %L', k, v);
          |    ELSE
          |      upd := upd || format(', %I = %L', k, v);
          |    END IF;
          |    icols := icols || format(', %I', k);
          |    ivals := ivals || format(', %L', v);
          |  END LOOP;
          |  IF upd = '' THEN
          |    EXECUTE format('SELECT count(*) FROM %I.%I WHERE true', nsp, tbl)
          |      || cond INTO n;
          |  ELSE
          |    EXECUTE format('UPDATE %I.%I SET ', nsp, tbl)
          |      || substr(upd, 3) || ' WHERE true' || cond;
          |    GET DIAGNOSTICS n = ROW_COUNT;
          |  END IF;
          |  IF n = 0 THEN
          |    EXECUTE format('INSERT INTO %I.%I (', nsp, tbl)
          |      || substr(icols, 3) || ') VALUES (' || substr(ivals, 3) || ')';
          |    n := 1;
          |  END IF;
          |  RETURN n;
          |END $fn$""".stripMargin
    else sysTableDdl(sysSchema)

  /** Known column inventory of the sync'able tables — the install-time
    * metadata the reference reads live from INFORMATION_SCHEMA
    * (`dbopt/MysqlOperation.scala:122` columns query); here it is
    * config-declared (the driver test tables' schemas) so emitted DDL
    * is complete without a live connection. */
  val TableColumns: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))

  /** Trigger DDL spec rows: one per (sync entry, I/U/D op), in the
    * DIALECT of the entry's source db (`dbs[].type`). Pure — the
    * DataFrame AND the DuckDB oracle VALUES literal both derive from
    * this, so they cannot drift.
    *
    * Dialects mirror the reference's split templates: postgresql /
    * greenplum use a trigger FUNCTION + `row_to_json`
    * (`dbopt/PgOperation.scala:116-214`); mysql has no trigger
    * function — the body is inlined `BEGIN … JSON_OBJECT … END`
    * preceded by `DROP TRIGGER IF EXISTS`, and the trigger condition
    * guards via `if … then` (`dbopt/MysqlOperation.scala:109-151`).
    * The DDL text itself is our own template, same information
    * content. */
  def triggerSpecRows(yaml: String = DemoYaml):
      Seq[(String, String, String, String, String, String, String, String)] = {
    val cfg = parse(yaml)
    val dialectOf = cfg.dbs.map(d => d.name -> d.`type`).toMap
    val ops = List("insert" -> "I", "update" -> "U", "delete" -> "D")
    for {
      sc <- cfg.sync
      (opName, opCode) <- ops
    } yield {
      val dialect = dialectOf.getOrElse(sc.sourceDb, "postgresql")
      val trigger = s"sync_${opName}_trigger"
      val action = opName.toUpperCase(java.util.Locale.ROOT)
      val payload = if (opCode == "D") "OLD" else "NEW"
      val (fn, ddl) = dialect match {
        case "mysql" =>
          // mysql: no trigger function; DROP-then-CREATE with an
          // inlined JSON_OBJECT body, one insert per fan-out target.
          // JSON_OBJECT takes explicit 'col', NEW.col pairs — the
          // reference enumerates them from INFORMATION_SCHEMA at
          // install time (MysqlOperation.scala:122); here the FULL
          // column list comes from the config-declared TableColumns
          // inventory (keys first, reference order), so every emitted
          // statement parses under MySQL grammar with no elisions.
          val keys = sc.sourceKeys.split(",").map(_.trim).toSeq
          val cols = keys ++ TableColumns
            .getOrElse(sc.sourceTable, Seq.empty).filterNot(keys.contains)
          val colPairs = cols.map(k => s"'$k', $payload.$k").mkString(", ")
          val inserts = sc.targetDb.split(",").map(_.trim).map(t =>
            s"INSERT INTO dbsync.sync_data (source_db, target_db, schema_name, " +
              s"table_name, operation, data) VALUES ('${sc.sourceDb}', '$t', " +
              s"'${sc.sourceSchema}', '${sc.sourceTable}', '$opCode', " +
              s"JSON_OBJECT($colPairs))")
            .mkString("; ")
          ("",
            s"DROP TRIGGER IF EXISTS ${sc.sourceSchema}.$trigger; " +
              s"CREATE TRIGGER ${sc.sourceSchema}.$trigger AFTER $action ON " +
              s"${sc.sourceSchema}.${sc.sourceTable} FOR EACH ROW BEGIN " +
              s"IF ${sc.conditionFor(opCode)} THEN $inserts; END IF; END")
        case _ =>
          // postgresql + greenplum share the pg trigger shape: a full
          // `CREATE OR REPLACE FUNCTION … RETURNS trigger LANGUAGE
          // plpgsql` body (reference template: dbopt/PgOperation
          // .scala:114-140) with the per-op capture condition folded
          // into its IF guard (condition slot, PgOperation.scala:142).
          // Fan-out is unrolled at install time — one INSERT per
          // configured target — instead of the reference's runtime
          // string split; DDL regenerates on config change anyway (the
          // version hash in desiredCatalogRows forces a REBUILD).
          val f = s"sync_${sc.sourceTable}_$opName"
          val inserts = sc.targetDb.split(",").map(_.trim).map(t =>
            s"INSERT INTO dbsync.sync_data (source_db, target_db, " +
              s"schema_name, table_name, operation, data) VALUES " +
              s"('${sc.sourceDb}', '$t', '${sc.sourceSchema}', " +
              s"'${sc.sourceTable}', '$opCode', row_to_json($payload));")
            .mkString(" ")
          (f,
            s"DROP TRIGGER IF EXISTS $trigger ON " +
              s"${sc.sourceSchema}.${sc.sourceTable}; " +
              s"DROP FUNCTION IF EXISTS ${sc.sourceSchema}.$f() CASCADE; " +
              s"CREATE OR REPLACE FUNCTION ${sc.sourceSchema}.$f() " +
              s"RETURNS trigger LANGUAGE plpgsql AS $$fn$$ BEGIN " +
              s"IF ${sc.conditionFor(opCode)} THEN $inserts END IF; " +
              s"RETURN NULL; END $$fn$$; " +
              s"CREATE TRIGGER $trigger AFTER $action ON " +
              s"${sc.sourceSchema}.${sc.sourceTable} FOR EACH ROW " +
              s"EXECUTE PROCEDURE ${sc.sourceSchema}.$f()")
      }
      (sc.sourceDb, dialect, sc.sourceSchema, sc.sourceTable, opCode, trigger,
        fn, ddl)
    }
  }

  /** Trigger DDL specs as a DataFrame — our own DDL dialect, same
    * information content as the reference's trigger templates. */
  def triggerSpecs(spark: SparkSession, yaml: String = DemoYaml): DataFrame = {
    import spark.implicits._
    triggerSpecRows(yaml).toDF("source_db", "dialect", "schema_name",
      "table_name", "op", "trigger_name", "function_name", "ddl")
  }

  /** Cascade sync topology — the reference's 级联同步 / binary-tree
    * sync (Readme feature list; a target db configured as a further
    * source relays the same table onward). Emits every replication
    * path per table: direct hops plus multi-hop chains, with the hop
    * count and the full db path. Spark side unrolls the closure by
    * joining the (bounded, config-sized) edge relation at most
    * |dbs|−1 times — no loops, no recursion; the DuckDB oracle uses an
    * actual RECURSIVE CTE, so the two derivations are genuinely
    * independent. */
  def syncTopology(spark: SparkSession, yaml: String = DemoYaml): DataFrame = {
    import org.apache.spark.sql.functions._
    val cfg = parse(yaml)
    val edges = configMatrix(spark, yaml)
      .select(col("table_name"), col("source_db"), col("target_db"))
    val base = edges.select(
      col("table_name"), col("source_db").as("origin_db"),
      col("target_db").as("dest_db"), lit(1L).as("hops"),
      concat_ws(">", col("source_db"), col("target_db")).as("path"))
    val maxHops = math.max(cfg.dbs.length - 1, 1)
    val all = (2 to maxHops).scanLeft(base) { (prev, _) =>
      prev.join(edges.select(col("table_name"),
          col("source_db").as("dest_db"), col("target_db").as("next_db")),
          Seq("table_name", "dest_db"))
        .select(col("table_name"), col("origin_db"),
          col("next_db").as("dest_db"), (col("hops") + 1L).as("hops"),
          concat_ws(">", col("path"), col("next_db")).as("path"))
    }
    all.reduce(_.unionByName(_))
  }

  /** Boot-time config validation — the lint pass a sync daemon runs
    * before starting any poller (the reference fails lazily per
    * route; linting the whole topology first is the operational
    * improvement every deployment writes itself): five checks, one
    * row each, with violation counts and sorted offender lists —
    * UNKNOWN_DB (route references an undeclared database), SELF_ROUTE
    * (source = target), DUP_ROUTE (the same (source, schema, table,
    * target) edge declared twice — double-apply), EMPTY_KEYS (no
    * primary key to merge on), CASCADE_CYCLE (a table's route graph
    * reaches itself — infinite replication). Config-sized driver-side
    * computation, like every config relation; the oracle pins the
    * demo config's expected all-OK verdict independently. */
  def configLint(spark: SparkSession, yaml: String = DemoYaml): DataFrame = {
    import spark.implicits._
    val cfg = parse(yaml)
    val dbNames = cfg.dbs.map(_.name).toSet
    val routes = for {
      sc <- cfg.sync
      tgt <- sc.targetDb.split(",").map(_.trim).toSeq
    } yield (sc.sourceDb, tgt, sc.sourceSchema, sc.sourceTable,
      Option(sc.sourceKeys).getOrElse(""))
    val unknown = routes
      .flatMap { case (s, t, _, _, _) => Seq(s, t).filterNot(dbNames) }
      .distinct.sorted
    val self = routes.collect { case (s, t, sch, tbl, _) if s == t =>
      s"$s>$t:$sch.$tbl"
    }.distinct.sorted
    val dup = routes.groupBy(r => (r._1, r._2, r._3, r._4))
      .collect { case (k, v) if v.size > 1 =>
        s"${k._1}>${k._2}:${k._3}.${k._4}"
      }.toSeq.sorted
    val emptyKeys = routes
      .collect { case (s, _, sch, tbl, k) if k.trim.isEmpty =>
        s"$s:$sch.$tbl"
      }.distinct.sorted
    val cycles = routes.groupBy(r => (r._3, r._4)).flatMap {
      case ((sch, tbl), rs) =>
        // self-loops are SELF_ROUTE's finding; the cycle check owns
        // the multi-hop loops only
        val adj = rs.collect { case r if r._1 != r._2 => r._1 -> r._2 }
          .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        def selfReaches(start: String): Boolean = {
          var seen = adj.getOrElse(start, Nil).toSet
          var grow = true
          while (grow && !seen(start)) {
            val nxt = seen.flatMap(n => adj.getOrElse(n, Nil)) -- seen
            grow = nxt.nonEmpty
            seen ++= nxt
          }
          seen(start)
        }
        val nodes = rs.flatMap(r => Seq(r._1, r._2)).distinct
        if (nodes.exists(selfReaches)) Some(s"$sch.$tbl") else None
    }.toSeq.sorted
    def row(check: String, offs: Seq[String]) =
      (check, offs.size.toLong,
        if (offs.isEmpty) "-" else offs.mkString(","),
        if (offs.isEmpty) "OK" else "FAIL")
    Seq(row("UNKNOWN_DB", unknown), row("SELF_ROUTE", self),
      row("DUP_ROUTE", dup), row("EMPTY_KEYS", emptyKeys),
      row("CASCADE_CYCLE", cycles))
      .toDF("check", "n_violations", "offenders", "verdict")
  }

  /** Datasource registry status — the `/status/datasource` endpoint of
    * the reference's monitor (`monitor/Endpoints.scala:54`,
    * `DatasourcePools.scala`): one row per configured database with its
    * resolved JDBC url, sys schema, and how many sync routes read from
    * / write to it (the config-derived half of pool health; live
    * connection counts are the untestable JDBC edge, SURVEY §6). Pure —
    * DataFrame and oracle VALUES share this generator. */
  def datasourceStatusRows(yaml: String = DemoYaml):
      Seq[(String, String, String, String, Long, Long)] = {
    val cfg = parse(yaml)
    cfg.dbs.map { db =>
      val asSource = cfg.sync.count(_.sourceDb == db.name).toLong
      val asTarget = cfg.sync
        .count(_.targetDb.split(",").map(_.trim).contains(db.name)).toLong
      (db.name, db.`type`, graft.sources.JdbcSync.url(db), db.sysSchema,
        asSource, asTarget)
    }
  }

  def datasourceStatus(spark: SparkSession, yaml: String = DemoYaml): DataFrame = {
    import spark.implicits._
    datasourceStatusRows(yaml).toDF("db", "db_type", "jdbc_url",
      "sys_schema", "n_source_routes", "n_target_routes")
  }

  /** The GET /config response body (`monitor/Endpoints.scala:82-92`):
    * the full parsed configuration as JSON — sys, db (the reference
    * scrubs each db's password before serializing; our model carries
    * none, same net shape), sync. Pure function of the YAML, rendered
    * with deterministic field order so the Spark literal and the
    * oracle literal are one string. Per-op capture conditions are
    * emitted only when the entry sets them (jackson omits our model's
    * null defaults the same way a scrubbed map drops keys). */
  def configEndpointJson(yaml: String = DemoYaml): String = {
    val cfg = parse(yaml)
    def q(s: String) = "\"" + s + "\""
    val sys = s"""{"partition":${cfg.sys.partition},"batch":${cfg.sys.batch},""" +
      s""""maxRetry":${cfg.sys.maxRetry},""" +
      s""""dataKeepHours":${cfg.sys.dataKeepHours},""" +
      s""""maxPollWait":${cfg.sys.maxPollWait}}"""
    val dbs = cfg.dbs.map(d =>
      s"""{"name":${q(d.name)},"type":${q(d.`type`)},""" +
        s""""sysSchema":${q(d.sysSchema)}}""").mkString("[", ",", "]")
    val sync = cfg.sync.map { sc =>
      val conds = Seq(
        Option(sc.insertCondition).map(c => s""""insertCondition":${q(c)}"""),
        Option(sc.updateCondition).map(c => s""""updateCondition":${q(c)}"""),
        Option(sc.deleteCondition).map(c => s""""deleteCondition":${q(c)}""")
      ).flatten
      (Seq(
        s""""sourceDb":${q(sc.sourceDb)}""",
        s""""targetDb":${q(sc.targetDb)}""",
        s""""sourceSchema":${q(sc.sourceSchema)}""",
        s""""sourceTable":${q(sc.sourceTable)}""",
        s""""sourceKeys":${q(sc.sourceKeys)}""") ++ conds)
        .mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    s"""{"sys":$sys,"db":$dbs,"sync":$sync}"""
  }

  // --- index + trigger reconciliation ------------------------------------

  /** One desired catalog object: triggers carry a version hash of their
    * DDL (the reference stores a hash of the trigger SQL in
    * sync_trigger_version and rebuilds on mismatch —
    * `dbopt/MysqlOperation.scala:143-151` triggerExists/saveTriggerVersion);
    * unique indexes carry their sorted column list
    * (`job/SyncTrigger.scala:104-126` checkIndex sorts sourceKeys before
    * comparing against `uniqueIndexExists`). */
  type CatalogRow = (String, String, String, String, String, String)
  //                 db      schema  table   type    name    version

  /** Desired catalog derived from config: every trigger of every sync
    * entry (on the SOURCE db) + a unique key index per (sync entry,
    * fan-out target) on the TARGET db. Pure. */
  def desiredCatalogRows(yaml: String = DemoYaml): Seq[CatalogRow] = {
    val cfg = parse(yaml)
    val triggers = triggerSpecRows(yaml).map {
      case (db, _, sch, tbl, _, trg, _, ddl) =>
        (db, sch, tbl, "trigger", trg,
          graft.functions.PortableHash.md5Hex(ddl))
    }
    val indexes = for {
      sc <- cfg.sync
      tgt <- sc.targetDb.split(",").toList.map(_.trim)
    } yield {
      val cols = sc.sourceKeys.split(",").map(_.trim).sorted.mkString(",")
      (tgt, sc.sourceSchema, sc.sourceTable, "index",
        s"uk_${sc.sourceTable}", cols)
    }
    (triggers ++ indexes).distinct
  }

  /** Simulated existing catalog — the deterministic stand-in for
    * `sync_trigger_version` + the target-db index catalog (the live
    * JDBC edge is untestable here, SURVEY §6). Shape: the first sync
    * table's objects are current (MATCHED), the second table's triggers
    * carry a stale version hash (REBUILD), the third table is absent
    * entirely (CREATE), and a retired table still holds triggers
    * (DROP — `init/TriggerInitializer.scala:24` cleanTrigger) and an
    * index (KEEP — the reference never drops indexes). */
  def existingCatalogRows(yaml: String = DemoYaml): Seq[CatalogRow] = {
    val cfg = parse(yaml)
    val desired = desiredCatalogRows(yaml)
    val tables = cfg.sync.map(_.sourceTable).distinct
    val current = desired.filter(r => tables.headOption.contains(r._3))
    val stale = desired
      .filter(r => tables.lift(1).contains(r._3) && r._4 == "trigger")
      .map(r => r.copy(_6 = "0000stale0000"))
    val orphans = Seq(
      ("db0", "public", "retired_table", "trigger", "sync_insert_trigger",
        "0000orphan000"),
      ("db1", "public", "retired_table", "index", "uk_retired_table", "id"))
    current ++ stale ++ orphans
  }

  /** Index + trigger reconciliation — the Spark form of the reference's
    * per-boot catalog repair (`job/SyncTrigger.scala` syncTrigger +
    * checkIndex, `init/TriggerInitializer.scala` cleanTrigger): a
    * full-outer diff of desired vs existing catalog per object.
    * Actions: CREATE (desired, absent), MATCHED (version equal),
    * REBUILD (version drift), DROP (orphan trigger), KEEP (orphan
    * index — never auto-dropped). Both sides are tiny config-derived
    * relations; at scale this stays a broadcastable metadata join, not
    * a data-path operator. */
  def syncReconcile(spark: SparkSession, yaml: String = DemoYaml): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cols = Seq("db", "schema_name", "table_name", "object_type",
      "object_name")
    val want = desiredCatalogRows(yaml).toDF(cols :+ "want_version": _*)
    val have = existingCatalogRows(yaml).toDF(cols :+ "have_version": _*)
    want.join(have, cols, "full_outer")
      .select(col("db"), col("schema_name"), col("table_name"),
        col("object_type"), col("object_name"),
        when(col("have_version").isNull, lit("CREATE"))
          .when(col("want_version").isNull && col("object_type") === "trigger",
            lit("DROP"))
          .when(col("want_version").isNull, lit("KEEP"))
          .when(col("want_version") === col("have_version"), lit("MATCHED"))
          .otherwise(lit("REBUILD")).as("action"))
  }
}
