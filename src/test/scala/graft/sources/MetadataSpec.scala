package graft.sources

import graft.SparkSpec
import com.fasterxml.jackson.databind.ObjectMapper

/** S4 gdalinfo-JSON twin (`utils/gdal.py:170-238`) and the PAM stats
  * sidecar read-back — VERDICT r14 missing-items 3. */
class MetadataSpec extends SparkSpec {
  import spark.implicits._

  private def writeTiff(path: String, vals: Int => Double,
                        noData: Option[Double] = Some(0.0)): String = {
    val profile = GeoTiff.Profile(
      width = 32, height = 32, bands = 1, dataType = "uint16",
      tileWidth = 16, tileHeight = 16, noData = noData, epsg = 4326,
      originX = -10.0, originY = 20.0, xres = 0.25, yres = 0.25)
    val w = new GeoTiff.Writer(path, profile)
    for (tr <- 0 to 1; tc <- 0 to 1)
      w.writeTile(1, tr, tc, Array.tabulate(256)(i => vals(tr * 1024 + tc * 512 + i)))
    w.close()
    path
  }

  private val mapper = new ObjectMapper

  test("fetchMetadata emits the gdalinfo -json shape get_metadata parses") {
    val p = java.nio.file.Files.createTempDirectory("graft_meta")
    val src = writeTiff(s"$p/a.tif", i => (i % 5 + 1).toDouble)
    val rows = GeoTiffSpark.fetchMetadata(spark, Seq(src)).collect()
    assert(rows.length == 1 && rows(0).getString(0) == src)
    val m = mapper.readTree(rows(0).getString(1))
    // exactly the fields utils/gdal.py:191-205 reads
    assert(m.get("size").get(0).asInt == 32 && m.get("size").get(1).asInt == 32)
    assert(m.get("driverShortName").asText == "GTiff")
    assert(m.get("geoTransform").get(1).asDouble == 0.25)
    assert(m.get("geoTransform").get(5).asDouble == -0.25)
    assert(m.get("cornerCoordinates").get("lowerLeft").get(0).asDouble == -10.0)
    assert(m.get("cornerCoordinates").get("lowerLeft").get(1).asDouble == 12.0)
    assert(m.get("cornerCoordinates").get("upperRight").get(0).asDouble == -2.0)
    assert(m.get("cornerCoordinates").get("upperRight").get(1).asDouble == 20.0)
    assert(m.get("coordinateSystem").get("wkt").asText.contains("4326"))
    assert(m.get("metadata").get("IMAGE_STRUCTURE").get("COMPRESSION").asText == "DEFLATE")
    val b = m.get("bands").get(0)
    assert(b.get("type").asText == "UInt16") // reverse of data_type.py:163-167
    assert(b.get("block").get(0).asInt == 16 && b.get("block").get(1).asInt == 16)
    assert(b.get("noDataValue").asDouble == 0.0)
    assert(b.get("minimum") == null) // no -stats: stats keys absent
  }

  test("fetchMetadata -stats: exact nodata-excluded fold") {
    val p = java.nio.file.Files.createTempDirectory("graft_meta")
    // half the pixels nodata(0), the rest alternate 2 and 4
    val src = writeTiff(s"$p/b.tif", i => if (i % 2 == 0) 0.0 else if (i % 4 == 1) 2.0 else 4.0)
    val m = mapper.readTree(GeoTiffSpark
      .fetchMetadata(spark, Seq(src), computeStats = true)
      .collect()(0).getString(1))
    val b = m.get("bands").get(0)
    assert(b.get("minimum").asDouble == 2.0 && b.get("maximum").asDouble == 4.0)
    assert(b.get("mean").asDouble == 3.0)
    assert(b.get("stdDev").asDouble == 1.0) // values equally split 2/4 → σ=1
  }

  test("fetchMetadata -hist: 256 integer-style buckets whose mass is the valid count") {
    val p = java.nio.file.Files.createTempDirectory("graft_meta")
    val src = writeTiff(s"$p/c.tif", i => (i % 3 + 1).toDouble) // 1,2,3 — no nodata hits
    val m = mapper.readTree(GeoTiffSpark
      .fetchMetadata(spark, Seq(src), computeHistogram = true)
      .collect()(0).getString(1))
    val h = m.get("bands").get(0).get("histogram")
    assert(h.get("count").asInt == 256)
    assert(h.get("min").asDouble == 0.5 && h.get("max").asDouble == 3.5)
    val buckets = (0 until 256).map(h.get("buckets").get(_).asLong)
    assert(buckets.sum == 32L * 32)            // every pixel valid
    assert(buckets.count(_ > 0) == 3)          // exactly the 3 values
  }

  test("stats sidecar round-trips: writeStatsSidecars → readStatsSidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pam").toString
    val tileStats = Seq(
      ("t1", 1, 2.0, 9.0, 5.5, 1.25, 900L),
      ("t1", 2, 0.0, 1.0, 0.5, 0.5, 1000L))
      .toDF("tile_id", "band", "stat_min", "stat_max", "stat_mean", "stat_std", "n")
    val written = GeoTiffSpark.writeStatsSidecars(tileStats, dir, totalPixels = 1000L)
      .collect()
    assert(written.length == 1)
    val back = GeoTiffSpark.readStatsSidecar(s"$dir/t1.tif.aux.xml")
    assert(back.keySet == Set(1, 2))
    assert(back(1)("STATISTICS_MINIMUM") == 2.0)
    assert(back(1)("STATISTICS_MAXIMUM") == 9.0)
    assert(back(1)("STATISTICS_MEAN") == 5.5)
    assert(back(1)("STATISTICS_STDDEV") == 1.25)
    assert(back(1)("STATISTICS_VALID_PERCENT") == 90.0)
    assert(back(2)("STATISTICS_VALID_PERCENT") == 100.0)
  }
}
