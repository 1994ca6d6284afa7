package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bing tile functions (reference: plugin/trino-geospatial/src/main/java/io/
  * trino/plugin/geospatial/BingTileFunctions.java:86-344 and BingTile.java:28
  * — the quadtree web-mercator tiling family: bing_tile, bing_tile_at,
  * bing_tile_quadkey, bing_tile_coordinates, bing_tile_zoom_level,
  * bing_tile_polygon, bing_tiles_around).
  *
  * A tile is struct<x int, y int, zoom int> (the reference packs the same
  * three fields into a bigint — BingTile.java:87 `encode()`; a struct keeps
  * Catalyst pruning and codegen natural). All math is pure `Column`
  * arithmetic following the Microsoft projection exactly
  * (BingTileFunctions.java:606-637): pixel = axis * 256 * 2^zoom clamped to
  * [0, mapSize-1], tile = pixel / 256; so every function here stays inside
  * whole-stage codegen — no UDFs, no custom expressions needed.
  *
  * Scale note: tiles are the reference's spatial-join blocking device
  * (geometry_to_bing_tiles → equi-join on tile). The same composition works
  * here: bing_tile_at as a shuffle key gives a web-mercator-partitioned
  * spatial join for free.
  */
object BingTiles {

  val MaxZoom = 23
  val MinLatitude = -85.05112878
  val MaxLatitude = 85.05112878

  /** mapSize in pixels at a zoom level: 256 * 2^zoom (BingTileFunctions.java:644). */
  private def mapSizePx(zoom: Column): Column =
    (lit(256.0) * pow(lit(2.0), zoom.cast("double")))

  private def axisToTile(axis: Column, zoom: Column): Column = {
    val mp = mapSizePx(zoom)
    val px = greatest(lit(0.0), least(axis * mp, mp - 1))
    floor(px / 256.0).cast("int")
  }

  /** bing_tile_at x-coordinate: longitude → tile X (BingTileFunctions.java:616). */
  def tileX(lon: Column, zoom: Column): Column =
    axisToTile((lon + 180.0) / 360.0, zoom)

  /** bing_tile_at y-coordinate: latitude → tile Y via web-mercator
    * (BingTileFunctions.java:623: y = 0.5 - ln((1+sinLat)/(1-sinLat))/(4π)). */
  def tileY(lat: Column, zoom: Column): Column = {
    val sinLat = sin(lat * math.Pi / 180.0)
    axisToTile(lit(0.5) - log((lit(1.0) + sinLat) / (lit(1.0) - sinLat)) / (4.0 * math.Pi), zoom)
  }

  /** bing_tile(x, y, zoom) — the tile constructor. */
  def bingTile(x: Column, y: Column, zoom: Column): Column =
    struct(x.cast("int").as("x"), y.cast("int").as("y"), zoom.cast("int").as("zoom"))

  /** Reference domain (BingTileFunctions.java checkLatitude/checkLongitude/
    * checkZoomLevel): latitude in [-85.05112878, 85.05112878], longitude in
    * [-180, 180], zoom in [0, 23]. Out-of-domain inputs raise
    * INVALID_FUNCTION_ARGUMENT there; here they yield NULL (the engine's
    * TRY-friendly lax form), never a silently-clamped edge tile. */
  private def inDomain(lat: Column, lon: Column, zoom: Column): Column =
    lat.between(MinLatitude, MaxLatitude) && lon.between(-180.0, 180.0) &&
      zoom.between(0, MaxZoom)

  /** bing_tile_at(lat, lon, zoom). */
  def bingTileAt(lat: Column, lon: Column, zoom: Column): Column =
    when(inDomain(lat, lon, zoom),
      bingTile(tileX(lon, zoom), tileY(lat, zoom), zoom))

  /** bing_tile_coordinates(tile) → (x, y); bing_tile_zoom_level(tile) → zoom. */
  def tileCoordinates(tile: Column): Column = struct(tile("x"), tile("y"))
  def tileZoomLevel(tile: Column): Column = tile("zoom")

  /** bing_tile_quadkey(tile): digit i (from the most significant) interleaves
    * bit (zoom-i) of x and y (BingTile.java:125 toQuadKey). Expressed as a
    * TRANSFORM over sequence(1..zoom) so variable zoom stays codegen'd;
    * 2^shift fits a double exactly for zoom ≤ 23. */
  def tileQuadkey(tile: Column): Column = {
    def bit(c: Column, shift: Column): Column =
      pmod(floor(c.cast("double") / pow(lit(2.0), shift.cast("double"))).cast("int"), lit(2))
    array_join(
      transform(sequence(lit(1), tile("zoom")), i => {
        val shift = tile("zoom") - i
        (bit(tile("x"), shift) + bit(tile("y"), shift) * 2).cast("string")
      }), "")
  }

  /** bing_tile(quadkey): inverse of tileQuadkey — AGGREGATE over the digit
    * positions rebuilds (x, y); zoom = length(quadkey)
    * (BingTileFunctions.java:140, BingTile.java:104 fromQuadKey). */
  def bingTileFromQuadkey(quadkey: Column): Column = {
    val zoom = length(quadkey)
    val built = aggregate(
      sequence(lit(1), zoom),
      struct(lit(0).as("x"), lit(0).as("y")),
      (acc, i) => {
        val d = substr(quadkey, i, lit(1)).cast("int")
        struct(
          (acc("x") * 2 + pmod(d, lit(2))).as("x"),
          (acc("y") * 2 + floor(d / 2).cast("int")).as("y"))
      })
    struct(built("x").cast("int").as("x"), built("y").cast("int").as("y"), zoom.cast("int").as("zoom"))
  }

  /** Tile corner → (lon, lat) (BingTileFunctions.java:580
    * tileXYToLatitudeLongitude): x = tileX*256/mapSize - 0.5 → lon = 360x;
    * y = 0.5 - tileY*256/mapSize → lat = 90 - 360·atan(e^(-2πy))/π. */
  private def cornerLon(x: Column, zoom: Column): Column = {
    val mp = mapSizePx(zoom)
    (greatest(lit(0.0), least(x.cast("double") * 256.0, mp)) / mp - 0.5) * 360.0
  }
  private def cornerLat(y: Column, zoom: Column): Column = {
    val mp = mapSizePx(zoom)
    val yy = lit(0.5) - greatest(lit(0.0), least(y.cast("double") * 256.0, mp)) / mp
    lit(90.0) - atan(exp(yy * (-2.0) * math.Pi)) * (360.0 / math.Pi)
  }

  /** bing_tile_polygon(tile) as its envelope struct<min_lon, min_lat,
    * max_lon, max_lat> (BingTileFunctions.java:334 + 642 tileToEnvelope —
    * upper-left corner at (x, y), lower-right at (x+1, y+1)). */
  def tilePolygon(tile: Column): Column = {
    val z = tile("zoom")
    struct(
      cornerLon(tile("x"), z).as("min_lon"),
      cornerLat(tile("y") + 1, z).as("min_lat"),
      cornerLon(tile("x") + 1, z).as("max_lon"),
      cornerLat(tile("y"), z).as("max_lat"))
  }

  /** geometry_to_bing_tiles over an envelope (BingTileFunctions.java:344 —
    * the reference's spatial-join blocking device): every tile at `zoom`
    * intersecting [minLon, maxLon] × [minLat, maxLat]. Tile y grows
    * southward, so the y-range runs from maxLat's tile to minLat's. */
  def geometryToBingTiles(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column,
      zoom: Column): Column = {
    val x1 = tileX(minLon, zoom); val x2 = tileX(maxLon, zoom)
    val y1 = tileY(maxLat, zoom); val y2 = tileY(minLat, zoom)
    when(inDomain(minLat, minLon, zoom) && inDomain(maxLat, maxLon, zoom),
      flatten(transform(sequence(x1, x2), x =>
        transform(sequence(y1, y2), y =>
          struct(x.cast("int").as("x"), y.cast("int").as("y"), zoom.cast("int").as("zoom"))))))
  }

  /** bing_tiles_around(lat, lon, zoom): the ≤9 neighbors of the containing
    * tile, clipped to the map edge (BingTileFunctions.java:164-190). */
  def tilesAround(lat: Column, lon: Column, zoom: Column): Column = {
    val cx = tileX(lon, zoom)
    val cy = tileY(lat, zoom)
    val maxIdx = (mapSizePx(zoom) / 256.0).cast("long") - 1
    val offsets = Seq(-1, 0, 1).flatMap(i => Seq(-1, 0, 1).map(j => (i, j)))
    val candidates = array(offsets.map { case (i, j) =>
      struct((cx + i).cast("int").as("x"), (cy + j).cast("int").as("y"), zoom.cast("int").as("zoom"))
    }: _*)
    when(inDomain(lat, lon, zoom),
      filter(candidates, t =>
        t("x") >= 0 && t("x") <= maxIdx && t("y") >= 0 && t("y") <= maxIdx))
  }
}
