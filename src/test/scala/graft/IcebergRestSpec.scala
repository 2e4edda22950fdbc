package graft

import scala.sys.process._

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, IcebergMirror, IcebergRest, LakeWriter}

/** Iceberg REST catalog discovery (the reference's Nessie REST role):
  * a FOREIGN PROCESS (stock curl, no graft code) walks the public
  * REST shapes — config, namespace list, table list, table load —
  * and resolves a graft table's CURRENT mirror metadata.json BY NAME.
  * Also the honest edges: read-only refusal, unknown names, a pin
  * whose mirror hasn't run. */
class IcebergRestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def curlBody(args: String*): String =
    (Seq("curl", "-s") ++ args).!!.trim

  private def curlCode(args: String*): Int =
    (Seq("curl", "-s", "-o", "/dev/null", "-w", "%{http_code}") ++ args)
      .!!.trim.toInt

  test("a foreign process resolves tables by name through the REST " +
      "catalog; pins stay consistent and fresh; writes refuse") {
    val zone = java.nio.file.Files
      .createTempDirectory("graft_rest").toString
    val docs = s"$zone/docs"
    val dims = s"$zone/dims"
    LakeWriter.commitSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), docs) // v1
    LakeWriter.commitSnapshot(
      Seq((10L, 1.5)).toDF("k", "w"), dims) // v1
    assert(IcebergMirror.mirror(spark, docs) == 1L)
    assert(IcebergMirror.mirror(spark, dims) == 1L)
    val cat = s"$zone/catalog"
    Catalog.commit(spark, cat, Map("docs" -> docs, "dims" -> dims))

    val server = IcebergRest.serve(spark, cat)
    try {
      val base = server.url
      // config + namespace discovery (what a stock client calls first)
      assert(JsonMethods.parse(curlBody(s"$base/v1/config"))
        .isInstanceOf[JObject])
      val ns = JsonMethods.parse(curlBody(s"$base/v1/namespaces"))
      assert((ns \ "namespaces") == JArray(List(JArray(List(
        JString("graft"))))))
      // table listing by name
      val tbls = JsonMethods.parse(
        curlBody(s"$base/v1/namespaces/graft/tables"))
      val names = (tbls \ "identifiers") match {
        case JArray(ids) => ids.map(i => (i \ "name").values.toString)
        case other => fail(s"no identifiers array: $other")
      }
      assert(names.toSet == Set("docs", "dims"))
      // LOAD BY NAME: metadata-location resolves to the mirror's
      // pinned metadata.json, and the embedded metadata is the real
      // Iceberg TableMetadata (format-version present, location set)
      val load = JsonMethods.parse(
        curlBody(s"$base/v1/namespaces/graft/tables/docs"))
      val loc1 = (load \ "metadata-location").values.toString
      assert(loc1.endsWith("/metadata/v1.metadata.json"), loc1)
      assert((load \ "metadata" \ "format-version") != JNothing)
      assert((load \ "metadata" \ "location") != JNothing)
      // the location is a REAL file a foreign reader can open
      val locPath = new org.apache.hadoop.fs.Path(loc1)
      assert(new java.io.File(locPath.toUri.getPath).isFile)

      // FRESHNESS: new snapshot + mirror + catalog commit -> the very
      // next load serves the new pin (stateless re-read per request)
      LakeWriter.commitSnapshot(
        Seq((3L, "c")).toDF("id", "v"), docs, "append") // v2
      assert(IcebergMirror.mirror(spark, docs) == 1L) // one new version
      Catalog.commit(spark, cat, Map("docs" -> docs, "dims" -> dims))
      val load2 = JsonMethods.parse(
        curlBody(s"$base/v1/namespaces/graft/tables/docs"))
      assert((load2 \ "metadata-location").values.toString
        .endsWith("/metadata/v2.metadata.json"))

      // honest edges: unknown table / namespace 404, write 405, a
      // pinned-but-unmirrored table 404s WITH the remedy
      assert(curlCode(s"$base/v1/namespaces/graft/tables/nope") == 404)
      assert(curlCode(s"$base/v1/namespaces/other/tables") == 404)
      assert(curlCode("-X", "POST",
        s"$base/v1/namespaces/graft/tables/docs") == 405)
      val raw = s"$zone/raw"
      LakeWriter.commitSnapshot(Seq((1L, 1L)).toDF("a", "b"), raw)
      Catalog.commit(spark, cat,
        Map("docs" -> docs, "dims" -> dims, "raw" -> raw))
      assert(curlCode(s"$base/v1/namespaces/graft/tables/raw") == 404)
      assert(curlBody(s"$base/v1/namespaces/graft/tables/raw")
        .contains("IcebergMirror.mirror"))
    } finally server.stop()
  }
}
