package graft.streaming

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Iceberg REST catalog protocol layer: namespace/table routes,
  * load-table shapes, and the commit conversation with requirements —
  * including the 409 requirement-failed retry that drives the OCC
  * rebase. */
class IcebergRestCatalogSpec extends SparkSpec {

  private val m = new ObjectMapper()

  private def commitBody(staged: IcebergFormat.StagedAppend,
      baseSnap: Long): String = {
    val files = staged.files.map { case (p, k, l) =>
      s"""["${p}","$k",$l]"""
    }.mkString("[", ",", "]")
    val snapReq =
      if (baseSnap < 0) """{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":null}"""
      else s"""{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$baseSnap}"""
    s"""{"requirements":[$snapReq],
       |"updates":[{"action":"add-snapshot","snapshot":{
       |  "stage-dir":"${staged.stageDir}",
       |  "base-version":${staged.baseVersion},
       |  "files":$files}}]}""".stripMargin
  }

  test("namespace and table lifecycle with the REST error ladder") {
    val root = Files.createTempDirectory("rest_catalog").toString
    val srv = new IcebergRestCatalog.Server(spark, root)
    assert(srv.handle("GET", "/v1/config").status === 200)
    // namespace 404 before create, 409 on duplicate create
    assert(srv.handle("GET", "/v1/namespaces/lake").status === 404)
    assert(srv.handle("POST", "/v1/namespaces",
      Some("""{"namespace":["lake"]}""")).status === 200)
    val dup = srv.handle("POST", "/v1/namespaces",
      Some("""{"namespace":["lake"]}"""))
    assert(dup.status === 409)
    assert(m.readTree(dup.body).get("error").get("type").asText()
      === "AlreadyExistsException")
    // create table; listing and load shapes
    val created = srv.handle("POST", "/v1/namespaces/lake/tables",
      Some("""{"name":"events","schema":[["ts","long"],["v","string"]]}"""))
    assert(created.status === 200)
    assert(m.readTree(created.body).get("metadata").get("format-version").asInt() === 2)
    assert(m.readTree(created.body).get("metadata")
      .get("current-snapshot-id").asLong() === -1L)
    assert(srv.handle("POST", "/v1/namespaces/lake/tables",
      Some("""{"name":"events","schema":[["ts","long"]]}""")).status === 409)
    assert(srv.handle("POST", "/v1/namespaces/nope/tables",
      Some("""{"name":"x","schema":[["ts","long"]]}""")).status === 404)
    val list = m.readTree(srv.handle("GET", "/v1/namespaces/lake/tables").body)
    assert(list.get("identifiers").get(0).get("name").asText() === "events")
    assert(srv.handle("GET", "/v1/namespaces/lake/tables/nope").status === 404)
    assert(srv.handle("DELETE", "/v1/namespaces/lake/tables/nope").status === 404)
  }

  test("commit conversation: requirements gate, 409 conflict, reload-retry rebase") {
    import spark.implicits._
    val root = Files.createTempDirectory("rest_catalog_occ").toString
    val srv = new IcebergRestCatalog.Server(spark, root)
    srv.handle("POST", "/v1/namespaces", Some("""{"namespace":["lake"]}"""))
    srv.handle("POST", "/v1/namespaces/lake/tables",
      Some("""{"name":"events","schema":[["ts","long"],["v","string"]]}"""))
    val table = s"$root/lake/events"

    def stage(n: Int, tag: String) = IcebergFormat.stageAppend(
      (0 until n).map(i => (1700000000000L + i, s"$tag$i"))
        .toDF("ts", "v"), timestamp_millis(col("ts")), table)
    def mainSnap(): Long =
      m.readTree(srv.handle("GET", "/v1/namespaces/lake/tables/events").body)
        .get("metadata").get("current-snapshot-id").asLong()

    // both writers stage against the empty table (main ref absent)
    val a = stage(40, "a")
    val b = stage(25, "b")
    val baseA = mainSnap()
    assert(baseA === -1L)
    // A commits first — requirement "main is absent" holds
    val rA = srv.handle("POST", "/v1/namespaces/lake/tables/events/commit",
      Some(commitBody(a, -1L)))
    assert(rA.status === 200)
    assert(m.readTree(rA.body).get("commit").get("snapshot-id").asLong() === 1L)
    // B's stale requirement now fails with CommitFailedException
    val rB1 = srv.handle("POST", "/v1/namespaces/lake/tables/events/commit",
      Some(commitBody(b, -1L)))
    assert(rB1.status === 409)
    val e = m.readTree(rB1.body).get("error")
    assert(e.get("type").asText() === "CommitFailedException")
    assert(e.get("message").asText().contains("branch main was created concurrently"))
    // B reloads, retries with the fresh snapshot id — metadata-only rebase
    val rB2 = srv.handle("POST", "/v1/namespaces/lake/tables/events/commit",
      Some(commitBody(b, mainSnap())))
    assert(rB2.status === 200)
    assert(m.readTree(rB2.body).get("commit").get("snapshot-id").asLong() === 2L)
    // both writers' rows are live; neither snapshot was dropped
    assert(IcebergFormat.readTable(spark, table).count() === 65)
    val md = m.readTree(srv.handle("GET", "/v1/namespaces/lake/tables/events").body)
      .get("metadata")
    assert(md.get("snapshots").size() === 2)
    assert(md.get("refs").get("main").get("snapshot-id").asLong() === 2L)
    // a requirement against a WRONG id also conflicts with the has-changed wording
    val c = stage(5, "c")
    val rC = srv.handle("POST", "/v1/namespaces/lake/tables/events/commit",
      Some(commitBody(c, 1L)))
    assert(rC.status === 409)
    assert(m.readTree(rC.body).get("error").get("message").asText()
      .contains("has changed: expected id 1 != 2"))
    // assert-table-uuid: matching passes, mismatching fails
    val uuid = md.get("table-uuid").asText()
    val okUuid = srv.handle("POST", "/v1/namespaces/lake/tables/events/commit",
      Some(s"""{"requirements":[{"type":"assert-table-uuid","uuid":"$uuid"},
        |{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":2}],
        |"updates":[{"action":"add-snapshot","snapshot":{
        |"stage-dir":"${c.stageDir}","base-version":${c.baseVersion},
        |"files":${c.files.map { case (p, k, l) => s"""["$p","$k",$l]""" }
          .mkString("[", ",", "]")}}}]}""".stripMargin))
    assert(okUuid.status === 200)
    val badUuid = srv.handle("POST", "/v1/namespaces/lake/tables/events/commit",
      Some("""{"requirements":[{"type":"assert-table-uuid","uuid":"wrong"}],
        |"updates":[]}""".stripMargin))
    assert(badUuid.status === 409)
    assert(m.readTree(badUuid.body).get("error").get("message").asText()
      .contains("UUID does not match"))
  }

  test("set-properties rides the commit and lands on the snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("rest_catalog_props").toString
    val srv = new IcebergRestCatalog.Server(spark, root)
    srv.handle("POST", "/v1/namespaces", Some("""{"namespace":["lake"]}"""))
    srv.handle("POST", "/v1/namespaces/lake/tables",
      Some("""{"name":"t","schema":[["ts","long"],["v","string"]]}"""))
    val table = s"$root/lake/t"
    val st = IcebergFormat.stageAppend(
      Seq((1700000000000L, "x")).toDF("ts", "v"), timestamp_millis(col("ts")), table)
    val files = st.files.map { case (p, k, l) => s"""["$p","$k",$l]""" }
      .mkString("[", ",", "]")
    val r = srv.handle("POST", "/v1/namespaces/lake/tables/t/commit",
      Some(s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":null}],
        |"updates":[
        |  {"action":"set-properties","updates":{"graft.committed-offset":"41"}},
        |  {"action":"add-snapshot","snapshot":{"stage-dir":"${st.stageDir}",
        |   "base-version":${st.baseVersion},"files":$files}}]}""".stripMargin))
    assert(r.status === 200)
    assert(IcebergFormat.snapshotProperty(spark, table, "graft.committed-offset")
      === Some("41"))
  }
}
