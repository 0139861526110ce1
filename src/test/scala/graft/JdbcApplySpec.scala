package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.SyncConfig
import graft.operators.{CdcMerge, ChangeLog}
import graft.sources.JdbcSync

/** LIVE JDBC round-trip against an embedded in-JVM Derby database —
  * the execution half of the sync edge (SURVEY §6 #1) actually running:
  * the real changelog merges, applies partition-parallel through
  * batched update-then-insert rounds, re-applies (updates, not duplicate
  * inserts), deletes, and is read back through spark.read.jdbc for the
  * comparison. Only the pg/mysql/greenplum dialect TEXT remains
  * generation-only (no networked DB in the sandbox).
  */
class JdbcApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sync = SyncConfig(
    sourceDb = "db0", targetDb = "tdb0",
    sourceSchema = "app", sourceTable = "user_state",
    sourceKeys = "user_id")

  private val url = "jdbc:derby:memory:graftApply;create=true"

  private def withStmt[A](f: java.sql.Statement => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try { val st = conn.createStatement(); try f(st) finally st.close() }
    finally conn.close()
  }

  private def readBack() = spark.read
    .format("jdbc").option("url", url)
    .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    .option("dbtable", "app.user_state").load()
    .select("user_id", "last_event_id", "last_op", "last_epoch_s",
      "last_value_cents")

  test("merged changelog round-trips through a live embedded database: " +
    "upsert, idempotent re-apply, update-on-conflict, delete") {
    // Derby's embedded driver registers via ServiceLoader; the schema
    // mirrors CdcMerge.merge's output
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    withStmt { st =>
      try st.execute("CREATE SCHEMA app") catch { case _: Exception => () }
      try st.execute("DROP TABLE app.user_state")
      catch { case _: Exception => () }
      st.execute(
        """CREATE TABLE app.user_state (
          |  user_id BIGINT PRIMARY KEY,
          |  last_event_id BIGINT,
          |  last_op VARCHAR(8),
          |  last_epoch_s BIGINT,
          |  last_value_cents BIGINT)""".stripMargin)
    }

    val merged = CdcMerge.merge(
      ChangeLog.normalize(Tables.events(spark, TestSpark.Sf)))
      .localCheckpoint()
    val want = merged.collect().map(_.toSeq).toSet
    assert(want.nonEmpty, "empty merge — vacuous round-trip")

    // 1. initial apply: every merged key lands
    JdbcSync.writeUpsertPortable(merged, url, sync)
    assert(readBack().collect().map(_.toSeq).toSet === want)

    // 2. idempotent re-apply: the update leg matches, never duplicates (a plain
    // INSERT executor would violate the PK here)
    JdbcSync.writeUpsertPortable(merged, url, sync)
    assert(readBack().collect().map(_.toSeq).toSet === want)

    // 3. a re-sync with changed values UPDATES in place
    val bumped = merged.withColumn("last_value_cents",
      col("last_value_cents") + 7L)
    JdbcSync.writeUpsertPortable(bumped, url, sync)
    val got3 = readBack().collect().map(_.toSeq).toSet
    assert(got3 === bumped.collect().map(_.toSeq).toSet)
    assert(got3 !== want)

    // 4. delete a deterministic subset, the rest survive
    val doomed = merged.where(pmod(col("user_id"), lit(3L)) === 0L)
      .select("user_id")
    JdbcSync.writeDelete(doomed, url, sync)
    val survivors = readBack().select("user_id").collect()
      .map(_.getLong(0)).toSet
    val doomedKeys = doomed.collect().map(_.getLong(0)).toSet
    assert(doomedKeys.nonEmpty && survivors.intersect(doomedKeys).isEmpty)
    assert(survivors.size ===
      merged.count().toInt - doomedKeys.size)
  }

  test("key-only table: the delete-then-insert leg keeps the upsert " +
    "idempotent (a bare re-INSERT would violate the PK)") {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val keySync = sync.copy(sourceTable = "seen_keys")
    withStmt { st =>
      try st.execute("CREATE SCHEMA app") catch { case _: Exception => () }
      try st.execute("DROP TABLE app.seen_keys")
      catch { case _: Exception => () }
      st.execute("CREATE TABLE app.seen_keys (user_id BIGINT PRIMARY KEY)")
    }
    val keysDf = CdcMerge.merge(
      ChangeLog.normalize(Tables.events(spark, TestSpark.Sf)))
      .select("user_id").localCheckpoint()
    val want = keysDf.collect().map(_.getLong(0)).toSet
    JdbcSync.writeUpsertPortable(keysDf, url, keySync)
    JdbcSync.writeUpsertPortable(keysDf, url, keySync) // re-apply: no PK blowup
    val got = spark.read.format("jdbc").option("url", url)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", "app.seen_keys").load()
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
  }
}
