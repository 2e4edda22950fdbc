package graft.sources

import java.net.{InetAddress, InetSocketAddress}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** READ-ONLY Iceberg REST catalog facade over a graft [[Catalog]] —
  * the discovery surface the reference stack gets from Nessie's REST
  * endpoint (config/nessie.properties:1-4; Trino/Superset resolve
  * `nessie.curated.*` tables by NAME, never by path): a stock
  * Iceberg REST client (pyiceberg, Trino, Snowflake) issues
  * `GET /v1/config`, lists namespaces/tables, and loads a table —
  * and gets back the graft table's CURRENT Iceberg-mirror
  * `metadata-location` plus the full TableMetadata JSON, instead of
  * being handed a mirrored tree's filesystem path out of band
  * (which was the r16 gap: the JDBC catalog serving exposes pins to
  * SQL clients, but an Iceberg-protocol client could not resolve by
  * name).
  *
  * Serving model — deliberately minimal and stateless:
  *  - pure JDK `com.sun.net.httpserver`, ZERO new dependencies (the
  *    offline-image constraint rules out real REST frameworks);
  *  - one graft catalog = one REST namespace; every request re-reads
  *    the catalog's LATEST commit pins (one small JSON — metadata-
  *    scale IO), so a catalog commit is visible to the next request
  *    and the server holds no mutable state to invalidate;
  *  - the table load serves `<table>/metadata/v<pinned>.metadata
  *    .json` of the table's ICEBERG MIRROR at the PINNED graft
  *    version (mirror versions track graft snapshot versions 1:1),
  *    so a cross-table catalog commit exposes a CONSISTENT set of
  *    table states — the Nessie property. A pin whose mirror has not
  *    been run yet answers 404 with the remedy, never a stale tree;
  *  - WRITE endpoints answer 405 read-only: graft commits go through
  *    [[LakeWriter]]/[[Catalog]], and pretending to accept a foreign
  *    commit would fork the history (honest refusal over silent
  *    success).
  *
  * At 100 TB nothing here scales with data: requests touch one
  * catalog-commit JSON and one table-metadata JSON. */
object IcebergRest {

  final case class Server(port: Int, http: HttpServer) {
    def url: String = s"http://127.0.0.1:$port"
    def stop(): Unit = http.stop(0)
  }

  /** Start serving `catalog`'s latest pins on `port` (0 = ephemeral;
    * loopback only — this is a discovery facade, not a hardened
    * endpoint). Stop via the returned handle. */
  def serve(spark: SparkSession, catalog: String,
            namespace: String = "graft", port: Int = 0): Server = {
    val http = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, port), 0)
    http.createContext("/", (x: HttpExchange) => handle(spark, catalog,
      namespace, x))
    // responses are metadata-scale: the dispatch thread suffices and
    // keeps the server free of pool lifecycle
    http.setExecutor(null)
    http.start()
    Server(http.getAddress.getPort, http)
  }

  // ---- request handling ----------------------------------------------

  private def handle(spark: SparkSession, catalog: String,
                     namespace: String, x: HttpExchange): Unit =
    try route(spark, catalog, namespace, x)
    catch {
      case scala.util.control.NonFatal(e) =>
        // headers may already be committed (body write failed
        // mid-stream) — the 500 is then impossible to send; swallow
        // the secondary failure so the ORIGINAL error isn't masked
        try respond(x, 500, err(500, "InternalServerError",
          String.valueOf(e.getMessage)))
        catch { case scala.util.control.NonFatal(_) => () }
    } finally x.close()

  private def route(spark: SparkSession, catalog: String,
                    namespace: String, x: HttpExchange): Unit = {
    val method = x.getRequestMethod.toUpperCase
    // URI.getPath already %XX-decodes per RFC 3986 and leaves '+'
    // literal (URLDecoder would turn a '+' in a table name into a
    // space and make it unresolvable)
    val segs = x.getRequestURI.getPath.split('/').filter(_.nonEmpty)
      .toSeq
    if (method != "GET" && method != "HEAD") {
      respond(x, 405, err(405, "UnsupportedOperationException",
        "graft's Iceberg REST catalog is read-only: commit through " +
          "graft.sources.LakeWriter / Catalog"))
      return
    }
    segs match {
      case Seq("v1", "config") =>
        respond(x, 200, JsonMethods.compact(JsonMethods.render(
          JObject("defaults" -> JObject(), "overrides" -> JObject()))))
      case Seq("v1", "namespaces") =>
        respond(x, 200, JsonMethods.compact(JsonMethods.render(
          JObject("namespaces" ->
            JArray(List(JArray(List(JString(namespace)))))))))
      case Seq("v1", "namespaces", ns) if ns == namespace =>
        respond(x, 200, JsonMethods.compact(JsonMethods.render(
          JObject("namespace" -> JArray(List(JString(namespace))),
            "properties" -> JObject()))))
      case Seq("v1", "namespaces", ns, "tables") if ns == namespace =>
        val names = latestPins(spark, catalog).keys.toSeq.sorted
        respond(x, 200, JsonMethods.compact(JsonMethods.render(
          JObject("identifiers" -> JArray(names.toList.map(n =>
            JObject("namespace" -> JArray(List(JString(namespace))),
              "name" -> JString(n))))))))
      case Seq("v1", "namespaces", ns, "tables", t) if ns == namespace =>
        loadTable(spark, catalog, t, x)
      case Seq("v1", "namespaces", ns, _*) if ns != namespace =>
        respond(x, 404, err(404, "NoSuchNamespaceException",
          s"namespace $ns not found (this catalog serves " +
            s"'$namespace')"))
      case _ =>
        respond(x, 404, err(404, "NotFoundException",
          s"no route for ${x.getRequestURI.getPath}"))
    }
  }

  /** LoadTableResult for a pinned table: the NEWEST mirror metadata
    * whose CURRENT snapshot carries the pinned graft version in its
    * `graft-version` summary (the mirror's cursor). Metadata version
    * numbers are NOT graft versions — maintenance (expireSnapshots,
    * hint republish) advances them without a graft commit — so the
    * resolver walks vN.metadata.json newest-first and matches on the
    * cursor; the common pin-at-tip case parses exactly one file. */
  private def loadTable(spark: SparkSession, catalog: String,
                        name: String, x: HttpExchange): Unit =
    latestPins(spark, catalog).get(name) match {
      case None =>
        respond(x, 404, err(404, "NoSuchTableException",
          s"table $name is not pinned by the catalog's latest commit"))
      case Some((path, version)) =>
        val mdDir = new org.apache.hadoop.fs.Path(
          path.stripSuffix("/") + "/metadata")
        val fs = LakeWriter.fsOf(spark, mdDir)
        val vRe = """^v(\d+)\.metadata\.json$""".r
        val files =
          if (!fs.exists(mdDir)) Seq.empty
          else fs.listStatus(mdDir).toSeq.map(_.getPath).flatMap(p =>
            p.getName match {
              case vRe(n) => Some((n.toLong, p))
              case _ => None
            }).sortBy(-_._1)
        val hit = files.iterator.map { case (_, p) =>
          val in = fs.open(p)
          val j = try JsonMethods.parse(
            new java.io.InputStreamReader(in, "UTF-8"))
          finally in.close()
          (p, j)
        }.find { case (_, j) =>
          val cur = j \ "current-snapshot-id"
          (j \ "snapshots") match {
            case JArray(ss) => ss.exists(s =>
              (s \ "snapshot-id") == cur &&
                (s \ "summary" \ "graft-version") ==
                  JString(version.toString))
            case _ => false
          }
        }
        hit match {
          case None =>
            respond(x, 404, err(404, "NoSuchTableException",
              s"table $name is pinned at graft version $version but " +
                s"no metadata under $mdDir has that version current " +
                "— run IcebergMirror.mirror(spark, table) first"))
          case Some((p, j)) =>
            respond(x, 200, JsonMethods.compact(JsonMethods.render(
              JObject(
                "metadata-location" ->
                  JString(fs.makeQualified(p).toString),
                "metadata" -> j,
                "config" -> JObject()))))
        }
    }

  private def latestPins(spark: SparkSession,
                         catalog: String): Map[String, (String, Long)] =
    Catalog.commits(spark, catalog).lastOption
      .map(c => Catalog.pinsAt(spark, catalog, c))
      .getOrElse(Map.empty)

  private def err(code: Int, typ: String, msg: String): String =
    JsonMethods.compact(JsonMethods.render(JObject("error" -> JObject(
      "message" -> JString(msg), "type" -> JString(typ),
      "code" -> JInt(code)))))

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.getResponseHeaders.set("Content-Type", "application/json")
    if (x.getRequestMethod.equalsIgnoreCase("HEAD")) {
      x.sendResponseHeaders(code, -1L)
    } else {
      x.sendResponseHeaders(code, b.length.toLong)
      val os = x.getResponseBody
      try os.write(b) finally os.close()
    }
  }
}
