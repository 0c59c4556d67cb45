package graft.plans

import graft.SparkSpec
import graft.core.LayerSpec
import graft.functions.GeoFunctions
import graft.operators.Raster
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end layer job: the status algebra + filters + stats + manifests of
  * the reference pipe tests (tests/test_pipe.py, tests/test_raster_pipe.py),
  * driven fully inside Spark with a synthetic block reader. */
class LayerJobSpec extends SparkSpec {
  import spark.implicits._

  private val spec = LayerSpec(
    dataset = "d", version = "v1", sourceType = "raster", pixelMeaning = "x",
    dataType = "uint16", calc = Some("A * 2"), grid = "90/1008",
    sourceUri = Some(Seq("s3://b/tiles.geojson")), noData = Some(Seq(0.0)))

  // two footprints: western hemisphere file + an overlapping equatorial file
  private def catalog: DataFrame = Seq(
    ("s3://b/west.tif", 1, GeoFunctions.write(GeoFunctions.envelope(-180, -90, -30, 90))),
    ("s3://b/equator.tif", 1, GeoFunctions.write(GeoFunctions.envelope(-60, -45, 60, 45))))
    .toDF("uri", "band", "footprint")

  /** Reader: deterministic pixels everywhere, all valid. */
  private val reader: LayerJob.BlockReader = blocks =>
    Raster.synthesizeBand(blocks.drop("band"), band = 1)

  private lazy val result =
    LayerJob.run(spark, spec, catalog, reader)

  test("F2 prunes tiles outside the source extent") {
    // grid 90/1008 has 8 tiles; eastern-north/south pair (90..180) has no coverage
    val tiles = result.manifest.select("tile_id").as[String].collect().toSet
    assert(tiles.size == 6)
    assert(!tiles.exists(t => t.endsWith("090E")))
  }

  test("output blocks carry calc + fill semantics") {
    val row = result.blocks.limit(1).select(element_at(col("band_1"), 1)).collect()(0)
    assert(!row.isNullAt(0)) // filled uint16 (int compute type)
  }

  test("A3 stats exist per processed tile and are sane") {
    val st = result.tileStats.collect()
    assert(st.length == 6) // one band per tile
    st.foreach { r =>
      assert(r.getAs[Double]("stat_max") <= 2 * 255)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("manifest + extent render as FeatureCollections (K3)") {
    val tiles = LayerJob.renderTilesGeojson(result.manifest)
    assert(tiles.startsWith("""{"type":"FeatureCollection""""))
    assert(tiles.contains("d/v1/raster/epsg-4326/90x1008/x/geotiff/"))
    val extent = LayerJob.renderExtentGeojson(result.extent)
    assert(extent.contains("\"type\":\"Polygon\"") || extent.contains("\"type\":\"MultiPolygon\""))
  }

  test("manifest with stats carries per-band properties (Metadata.bands shape)") {
    val js = LayerJob.renderTilesGeojson(result.manifest, Some(result.tileStats))
    assert(js.contains("\"bands\":[{\"band\":1,"))
    assert(js.contains("\"std_dev\":"))
  }

  test("streamed tiles.geojson equals the driver-rendered string (with stats)") {
    val path = "target/tmp/layerjob_tiles.geojson"
    LayerJob.writeTilesGeojson(result.manifest, path, Some(result.tileStats))
    val streamed = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    assert(streamed == LayerJob.renderTilesGeojson(result.manifest, Some(result.tileStats)))
  }

  test("PAM stats sidecars: one aux.xml per tile with per-band statistics") {
    val dir = java.nio.file.Paths.get("target/tmp/layerjob_aux")
    java.nio.file.Files.createDirectories(dir)
    val written = graft.sources.GeoTiffSpark
      .writeStatsSidecars(result.tileStats, dir.toString, totalPixels = 1008L * 1008)
      .collect()
    assert(written.length == 6)
    val xml = new String(java.nio.file.Files.readAllBytes(
      dir.resolve(written(0).getString(0) + ".tif.aux.xml")), "UTF-8")
    assert(xml.startsWith("<PAMDataset>"))
    assert(xml.contains("<PAMRasterBand band=\"1\">"))
    assert(xml.contains("STATISTICS_MINIMUM") && xml.contains("STATISTICS_VALID_PERCENT"))
  }

  test("A4 per-tile histogram: bucket mass equals valid pixel count") {
    val r = LayerJob.run(spark, spec.copy(computeHistogram = true), catalog, reader)
    val hist = r.tileHistogram.get
    val h = hist.collect()
    assert(h.length == 6)
    val statByTile = r.tileStats.collect()
      .map(x => x.getAs[String]("tile_id") -> x.getAs[Long]("n")).toMap
    h.foreach { row =>
      val total = row.getSeq[Long](2).sum
      assert(total == statByTile(row.getString(0)),
        s"tile ${row.getString(0)}: hist mass $total != n ${statByTile(row.getString(0))}")
      assert(row.getSeq[Long](2).length == 256)
    }
  }

  test("status algebra: processed counts (pipe.py:137-168)") {
    val tally = result.status.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tally("processed") == 6)
    // the eastern pair has no source coverage (raster_pipe.py:62-68)
    assert(tally("skipped (does not intersect)") == 2)
    assert(!tally.contains("existing"))
  }

  test("F3: existing tiles skipped unless overwrite (test_pipe.py:50-107)") {
    val existing = Seq("90N_180W").toDF("tile_id")
    val r2 = LayerJob.run(spark, spec, catalog, reader, existing = Some(existing))
    val tally2 = r2.status.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tally2("processed") == 5 && tally2("existing") == 1)
    val r3 = LayerJob.run(spark, spec, catalog, reader, existing = Some(existing),
      overwrite = true)
    val tally3 = r3.status.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tally3("processed") == 6)
  }

  test("F1: subset restricts the seed (pipe.py:77-88)") {
    val r = LayerJob.run(spark, spec, catalog, reader, subset = Some(Seq("90N_180W")))
    assert(r.manifest.count() == 1)
  }

  test("union_bands: default intersects per-band footprints, true unions them") {
    // band 1 covers -180..0, band 2 covers -90..90 → intersection is -90..0
    // (2 tiles), union is -180..90 (6 tiles) on the 90° grid
    val spec2 = spec.copy(calc = Some("A + B"),
      sourceUri = Some(Seq("s3://b/a.tif", "s3://b/b.tif")))
    val cat2 = Seq(
      ("s3://b/a.tif", 1, GeoFunctions.write(GeoFunctions.envelope(-180, -90, 0, 90))),
      ("s3://b/b.tif", 2, GeoFunctions.write(GeoFunctions.envelope(-90, -90, 90, 90))))
      .toDF("uri", "band", "footprint")
    val constReader: LayerJob.BlockReader = blocks =>
      blocks
        .withColumn("values",
          transform(sequence(lit(0), col("width") * col("height") - 1), _ => lit(1.0)))
        .withColumn("valid",
          transform(sequence(lit(0), col("width") * col("height") - 1), _ => lit(true)))
    val inter = LayerJob.run(spark, spec2, cat2, constReader)
      .manifest.select("tile_id").as[String].collect().toSet
    assert(inter == Set("90N_090W", "00N_090W"), s"intersection got $inter")
    val uni = LayerJob.run(spark, spec2.copy(unionBands = true), cat2, constReader)
      .manifest.select("tile_id").as[String].collect().toSet
    assert(uni.size == 6 && inter.subsetOf(uni), s"union got $uni")
  }

  test("non-overlapping bands fail with the reference's error (layers.py:255-257)") {
    val spec2 = spec.copy(calc = Some("A + B"),
      sourceUri = Some(Seq("s3://b/a.tif", "s3://b/b.tif")))
    val disjoint = Seq(
      ("s3://b/a.tif", 1, GeoFunctions.write(GeoFunctions.envelope(-180, -90, -90, 90))),
      ("s3://b/b.tif", 2, GeoFunctions.write(GeoFunctions.envelope(0, -90, 90, 90))))
      .toDF("uri", "band", "footprint")
    val constReader: LayerJob.BlockReader = blocks =>
      blocks
        .withColumn("values",
          transform(sequence(lit(0), col("width") * col("height") - 1), _ => lit(1.0)))
        .withColumn("valid",
          transform(sequence(lit(0), col("width") * col("height") - 1), _ => lit(true)))
    val e = intercept[IllegalArgumentException](
      LayerJob.run(spark, spec2, disjoint, constReader))
    assert(e.getMessage.contains("Input bands do not overlap"))
    // an EMPTY multi-band catalog fails the same way, not with empty.reduce
    val empty = disjoint.limit(0)
    val e2 = intercept[IllegalArgumentException](
      LayerJob.run(spark, spec2, empty, constReader))
    assert(e2.getMessage.contains("Input bands do not overlap"))
  }

  test("J3 mosaic: higher-priority file wins where files overlap") {
    // reader that encodes the uri priority into the pixel value
    val priorityReader: LayerJob.BlockReader = blocks =>
      blocks.withColumn("values",
          transform(sequence(lit(0), col("width") * col("height") - 1),
            _ => col("priority").cast("double")))
        .withColumn("valid",
          transform(sequence(lit(0), col("width") * col("height") - 1), _ => lit(true)))
    val r = LayerJob.run(spark, spec.copy(calc = Some("A"), noData = None),
      catalog, priorityReader)
    // tile 45N_060W overlaps both files → mosaic picks priority 1 (first file)
    val v = r.blocks.filter(col("tile_id") === "90N_090W")
      .select(element_at(col("band_1"), 1)).limit(1).collect()(0)
    assert(v.getInt(0) == 1)
  }

  test("tiled layout (one source per tile, many per band) takes the mosaic bypass") {
    // ADVICE r15: the bypass used to key on catalog rows PER BAND, so the
    // common tiled layout — non-overlapping uris, one per tile — always
    // paid the collect_list mosaic shuffle despite one layer per block.
    // Keying on sources per (tile, band) lets it bypass; genuinely
    // overlapping catalogs (the `catalog` fixture) must still fold.
    val tiled = Seq(
      ("s3://b/w1.tif", 1, GeoFunctions.write(GeoFunctions.envelope(-180, 0, -90, 90))),
      ("s3://b/w2.tif", 1, GeoFunctions.write(GeoFunctions.envelope(-90, 0, 0, 90))))
      .toDF("uri", "band", "footprint")
    // the fold path's signature in the physical plan is the collect_list
    // overlay aggregate (the shuffle the bypass exists to avoid);
    // mosaic_fold itself hides inside unprinted aggregate result exprs
    def planOf(cat: DataFrame): String =
      LayerJob.run(spark, spec, cat, reader)
        .blocks.queryExecution.executedPlan.toString
    assert(!planOf(tiled).contains("collect_list"),
      "tiled one-source-per-tile layout must skip the overlay shuffle")
    assert(planOf(catalog).contains("collect_list"),
      "overlapping sources must still run the fold")
  }
}
