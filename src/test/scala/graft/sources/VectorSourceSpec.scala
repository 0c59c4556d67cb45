package graft.sources

import graft.core.grid.Bounds
import org.scalatest.funsuite.AnyFunSuite

/** S7 JDBC query rendering — the connection itself is external, so the
  * tested surface is the SQL the engine pushes into PostGIS: the same
  * `ST_Intersects(geom, ST_MakeEnvelope(…, 4326))` shape the reference
  * renders per tile (`tiles/vector_src_tile.py:31-42`). */
class VectorSourceSpec extends AnyFunSuite {

  private val b = Bounds(-10.0, -20.0, 30.0, 40.0)

  test("pushdown query carries the envelope intersect predicate (4326)") {
    val q = VectorSource.renderQuery("wdpa", "v2024", "value", None, b)
    assert(q.contains("ST_Intersects(geom, ST_MakeEnvelope(-10.0, -20.0, 30.0, 40.0, 4326))"))
    assert(q.contains("FROM wdpa.v2024"))
    assert(q.contains("ST_AsBinary(geom) AS geom"))
    assert(q.contains("SELECT value AS value"))
    assert(!q.contains("ORDER BY"))
  }

  test("calc expression replaces the raw field; order renders asc/desc") {
    val q = VectorSource.renderQuery("s", "t", "risk",
      Some("CASE WHEN cat = 'high' THEN 2 ELSE 1 END"), b, order = Some("desc"))
    assert(q.contains("CASE WHEN cat = 'high' THEN 2 ELSE 1 END AS risk"))
    assert(q.endsWith("ORDER BY CASE WHEN cat = 'high' THEN 2 ELSE 1 END DESC"))
    val qa = VectorSource.renderQuery("s", "t", "v", None, b, order = Some("asc"))
    assert(qa.endsWith("ORDER BY v ASC"))
  }

  test("existence probe matches the reference's LIMIT-1 shape") {
    val q = VectorSource.renderExistsQuery("s", "t", b)
    assert(q == "SELECT gfw_fid FROM s.t WHERE ST_Intersects(geom, " +
      "ST_MakeEnvelope(-10.0, -20.0, 30.0, 40.0, 4326)) LIMIT 1")
  }

  test("live JDBC scan — opt-in via GRAFT_JDBC_URL (canceled, NOT passed, " +
      "when no database is configured)") {
    // the sandbox has no PostGIS and the offline resolver cannot pull an
    // embedded driver, so this leg activates the moment an environment
    // provides GRAFT_JDBC_URL (+ optional _SCHEMA/_TABLE/_FIELD); until
    // then it reports CANCELED so the gap stays visible in test output
    val url = sys.env.get("GRAFT_JDBC_URL")
    assume(url.isDefined, "set GRAFT_JDBC_URL to run the live-database leg")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("jdbc-smoke")
      .config("spark.ui.enabled", "false").getOrCreate()
    val df = VectorSource.readJdbc(spark, url.get,
      sys.env.getOrElse("GRAFT_JDBC_SCHEMA", "public"),
      sys.env.getOrElse("GRAFT_JDBC_TABLE", "features"),
      sys.env.getOrElse("GRAFT_JDBC_FIELD", "gfw_fid"),
      calc = None, bounds = b)
    assert(df.columns.nonEmpty && df.count() >= 0)
  }
}
