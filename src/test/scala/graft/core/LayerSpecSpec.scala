package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** LayerSpec parsing + validators — ports tests/test_models.py. */
class LayerSpecSpec extends AnyFunSuite {

  /** The reference's minimal raster layer fixture (tests/conftest.py:133-142). */
  val minimalRaster: String =
    """{"dataset": "whrc_aboveground_biomass_stock_2000", "version": "v4",
      | "pixel_meaning": "Mg_ha-1", "data_type": "uint16", "grid": "10/40000",
      | "source_type": "raster",
      | "source_uri": ["s3://gfw-data-lake-test/tiles.geojson"]}""".stripMargin

  test("parses the reference's minimal raster fixture verbatim") {
    val s = LayerSpec.fromJson(minimalRaster)
    assert(s.dataset == "whrc_aboveground_biomass_stock_2000")
    assert(s.version == "v4" && s.grid == "10/40000" && s.bandCount == 1)
    assert(s.gridDef.numTiles == 648)
    assert(s.pixelType.name == "uint16")
  }

  test("multi-source calc layer (conftest.py:171-180)") {
    val s = LayerSpec.fromJson(
      """{"dataset": "d", "version": "v1.0", "pixel_meaning": "x",
        | "data_type": "uint16", "grid": "1/4000", "source_type": "raster",
        | "source_uri": ["s3://a/t.geojson", "s3://a/t.geojson"],
        | "calc": "A + B", "no_data": 0}""".stripMargin)
    assert(s.calc.contains("A + B") && s.noData.contains(Seq(0.0)))
  }

  test("version regex (pydantic.py:17)") {
    LayerSpec.fromJson(minimalRaster.replace("\"v4\"", "\"v20240807\""))
    LayerSpec.fromJson(minimalRaster.replace("\"v4\"", "\"v1.2.3\""))
    LayerSpec.fromJson(minimalRaster.replace("\"v4\"", "\"latest\""))
    intercept[IllegalArgumentException](
      LayerSpec.fromJson(minimalRaster.replace("\"v4\"", "\"4.0\"")))
  }

  test("NaN nodata string and order validation (test_models.py:33-47)") {
    val s = LayerSpec.fromJson(minimalRaster
      .replace("\"data_type\": \"uint16\"", "\"data_type\": \"float32\"")
      .replace("\"source_type\": \"raster\"", "\"source_type\": \"raster\", \"no_data\": \"nan\""))
    assert(s.noData.exists(_.head.isNaN))
    // NaN nodata on an int type is rejected (type-directed validation)
    intercept[IllegalArgumentException](LayerSpec.fromJson(minimalRaster
      .replace("\"source_type\": \"raster\"",
        "\"source_type\": \"raster\", \"no_data\": \"nan\"")).pixelType)
    // order must be asc/desc
    intercept[IllegalArgumentException](LayerSpec.fromJson(minimalRaster
      .replace("\"source_type\": \"raster\"",
        "\"source_type\": \"raster\", \"order\": \"sideways\"")))
    LayerSpec.fromJson(minimalRaster.replace("\"source_type\": \"raster\"",
      "\"source_type\": \"raster\", \"order\": \"desc\""))
  }

  test("raster requires source_uri; vector forbids it (pydantic.py:63-69)") {
    intercept[IllegalArgumentException](LayerSpec.fromJson(
      """{"dataset": "d", "version": "v4", "pixel_meaning": "x",
        | "data_type": "uint8", "grid": "1/4000", "source_type": "raster"}""".stripMargin))
    LayerSpec.fromJson( // vector without source_uri is fine
      """{"dataset": "d", "version": "v4", "pixel_meaning": "is",
        | "data_type": "uint8", "grid": "1/4000", "source_type": "vector",
        | "calc": "1"}""".stripMargin)
  }

  test("multi-band nodata list rules (pydantic.py:71-78, test_models.py:133-211)") {
    def spec(noData: String, bands: Int) =
      s"""{"dataset": "d", "version": "v4", "pixel_meaning": "x",
         | "data_type": "uint8", "grid": "1/4000", "source_type": "raster",
         | "source_uri": ["s3://a/t.geojson"], "band_count": $bands,
         | "no_data": $noData}""".stripMargin
    assert(LayerSpec.fromJson(spec("[0, 0, 0]", 3)).noData.contains(Seq(0.0, 0.0, 0.0)))
    intercept[IllegalArgumentException](LayerSpec.fromJson(spec("[0, 0]", 3)))
    intercept[IllegalArgumentException](LayerSpec.fromJson(spec("[0, 1, 0]", 3)))
  }

  test("destination prefix scheme preserved (tiles/tile.py:82-97)") {
    val s = LayerSpec.fromJson(minimalRaster)
    assert(s.prefix() ==
      "whrc_aboveground_biomass_stock_2000/v4/raster/epsg-4326/10x40000/Mg_ha-1/geotiff")
  }

  test("symbology colormap parses (pydantic.py:20-33)") {
    val s = LayerSpec.fromJson(
      """{"dataset": "d", "version": "v4", "pixel_meaning": "x",
        | "data_type": "uint8", "grid": "1/4000", "source_type": "raster",
        | "source_uri": ["s3://a/t.geojson"],
        | "symbology": {"type": "discrete",
        |   "colormap": {"1": {"red": 255, "green": 0, "blue": 0}}}}""".stripMargin)
    assert(s.symbology.get.colormap(1.0) == RGBA(255, 0, 0, 255))
  }

  test("unknown resampling rejected (resampling.py:9-25)") {
    intercept[IllegalArgumentException](LayerSpec.fromJson(
      minimalRaster.dropRight(1) + ""","resampling": "fancy"}"""))
  }
}
