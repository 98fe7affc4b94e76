package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Geo aggregations (SURVEY §2 C46–C48) — OpenSearch's geo family
  * (geotile_grid, geo_distance, geo_bounds/geo_centroid) over client
  * coordinates.
  *
  * The events table carries no coordinates, so lat/lon are synthesized
  * DETERMINISTICALLY from event columns on a 0.1° grid (same pattern as
  * the log-line synthesis: the oracle derives identical values from the
  * same integer arithmetic, so the geo math — not the synthesis — is
  * what's verified).
  *
  * Cross-engine float note: tile/ring math runs through libm
  * transcendentals (tan/ln/sin); JVM and DuckDB agree to ~1 ulp, which
  * only matters when a value lands within 1e-15 of a floor() boundary.
  * Every floor/bucket input is therefore rounded to 9 decimals first —
  * beyond any libm divergence, far finer than the 0.1° input grid.
  *
  * Scale: all three are single map-side-combined aggregations over
  * pure column arithmetic — no shuffle beyond the final small groupBy.
  */
object Geo {

  /** Synthesized coordinates: lat ∈ [-80, 79.9], lon ∈ [-180, 179.9]
    * on a 0.1° grid (clear of the ±85.0511° web-mercator cut).
    */
  def latCol: Column = ((col("user_id") * 13) % 1600) / 10.0 - 80.0
  def lonCol: Column = ((col("event_id") * 17) % 3600) / 10.0 - 180.0

  private val latSql = "((user_id * 13) % 1600) / 10.0 - 80.0"
  private val lonSql = "((event_id * 17) % 3600) / 10.0 - 180.0"

  /** C46b — geohash_grid at precision 4 (OpenSearch's other grid agg —
    * base-32 geohash cells instead of web-mercator tiles). A geohash
    * is bit-interleaved lat/lon fractions; the 20 bits (10 lon + 10
    * lat at precision 4) are extracted and interleaved with pure
    * integer shift/mask column arithmetic — exact in both engines, no
    * transcendentals at all — and the base-32 alphabet lookup is an
    * `element_at` on a literal char array. One codegen'd projection +
    * one map-side-combined aggregate.
    */
  private val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  def geohashGrid(spark: SparkSession, dir: String): DataFrame = {
    val nb = 10 // bits per axis at precision 4
    val lonI = least(floor(round((lonCol + 180.0) / 360.0 * (1 << nb), 9)).cast("long"),
      lit((1L << nb) - 1))
    val latI = least(floor(round((latCol + 90.0) / 180.0 * (1 << nb), 9)).cast("long"),
      lit((1L << nb) - 1))
    // MSB-first interleave, lon leads (the geohash convention)
    val combined = (0 until 2 * nb).map { k =>
      val (src, b) = if (k % 2 == 0) (lonI, nb - 1 - k / 2) else (latI, nb - 1 - k / 2)
      shiftright(src, b).bitwiseAND(lit(1L)) * lit(1L << (2 * nb - 1 - k))
    }.reduce(_ + _)
    val alphabet = array(b32.map(ch => lit(ch.toString)): _*)
    val hash = concat((0 until 4).map { c =>
      element_at(alphabet,
        (shiftright(combined, 5 * (3 - c)).bitwiseAND(lit(31L)) + 1).cast("int"))
    }: _*)
    Tables.events(spark, dir)
      .select(hash.as("geohash"))
      .groupBy(col("geohash"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("geohash"))
  }

  val geohashGridSql: String = {
    val nb = 10
    val interleave = (0 until 2 * nb).map { k =>
      val (src, b) = if (k % 2 == 0) ("lon_i", nb - 1 - k / 2) else ("lat_i", nb - 1 - k / 2)
      s"((($src >> $b) & 1) * ${1L << (2 * nb - 1 - k)})"
    }.mkString(" + ")
    val chars = (0 until 4).map { c =>
      s"substr('$b32', CAST(((combined >> ${5 * (3 - c)}) & 31) AS INT) + 1, 1)"
    }.mkString(", ")
    s"""WITH g AS (
       |  SELECT
       |    least(CAST(floor(round((($lonSql) + 180.0) / 360.0 * ${1 << nb}, 9)) AS BIGINT), ${(1L << nb) - 1}) AS lon_i,
       |    least(CAST(floor(round((($latSql) + 90.0) / 180.0 * ${1 << nb}, 9)) AS BIGINT), ${(1L << nb) - 1}) AS lat_i
       |  FROM events),
       |c AS (SELECT $interleave AS combined FROM g)
       |SELECT concat($chars) AS geohash, count(*) AS n
       |FROM c
       |GROUP BY 1
       |ORDER BY geohash""".stripMargin
  }

  /** C46f — hexagonal grid aggregation (the `geohex_grid` dashboard
    * semantics: hex cells tile the map without the rectangular grid's
    * aspect distortion, so densities compare across cells). OpenSearch
    * binds this to Uber H3; re-implementing H3's icosahedral projection
    * is out of scope, so this is the DETERMINISTIC hex stand-in with
    * the same dashboard contract: pointy-top axial hexes over the
    * web-mercator plane (the C46 projection), cell key = cube-rounded
    * (q, r). All pure column arithmetic — mercator transcendentals,
    * then the standard cube-round (round each axis, re-derive the one
    * with the largest rounding error so q+r+s=0 holds). Float device:
    * axial coords round to 9 decimals BEFORE cube-round (the C46
    * boundary rule — beyond libm divergence), and the √3/3 literal is
    * Scala-computed and embedded identically in both engines. One
    * codegen'd projection + one map-side-combined aggregate.
    */
  private val sqrt3over3 = String.format(java.util.Locale.ROOT, "%.17g",
    Double.box(math.sqrt(3.0) / 3.0)).trim
  private val hexWorld = 1024.0 // mercator plane size in world units
  private val hexSize = 8.0     // hex cell size in world units

  def geohexGrid(spark: SparkSession, dir: String): DataFrame = {
    val mx = (lonCol + 180.0) / 360.0 * hexWorld
    val latR = radians(latCol)
    val my = (lit(1.0) - log(tan(latR) + lit(1.0) / cos(latR)) / math.Pi) / 2.0 * hexWorld
    val qf = round((expr(sqrt3over3) * mx - my / 3.0) / hexSize, 9)
    val rf = round((my * 2.0 / 3.0) / hexSize, 9)
    val yf = -qf - rf
    val (rx, ry, rz) = (round(qf, 0), round(yf, 0), round(rf, 0))
    val (dx, dy, dz) = (abs(rx - qf), abs(ry - yf), abs(rz - rf))
    val fixQ = dx > dy && dx > dz
    val qk = when(fixQ, -ry - rz).otherwise(rx).cast("long")
    val rk = when(!fixQ && !(dy > dz), -rx - ry).otherwise(rz).cast("long")
    Tables.events(spark, dir)
      .select(concat(qk.cast("string"), lit(","), rk.cast("string")).as("hex"))
      .groupBy(col("hex"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hex"))
  }

  val geohexGridSql: String =
    s"""WITH m AS (
       |  SELECT (($lonSql) + 180.0) / 360.0 * $hexWorld AS mx,
       |         (1.0 - ln(tan(radians($latSql)) + 1.0 / cos(radians($latSql))) / pi()) / 2.0 * $hexWorld AS my
       |  FROM events),
       |ax AS (
       |  SELECT round(($sqrt3over3 * mx - my / 3.0) / $hexSize, 9) AS qf,
       |         round((my * 2.0 / 3.0) / $hexSize, 9) AS rf
       |  FROM m),
       |cube AS (
       |  SELECT qf, rf, -qf - rf AS yf,
       |         round(qf, 0) AS rx, round(-qf - rf, 0) AS ry, round(rf, 0) AS rz
       |  FROM ax),
       |fixed AS (
       |  SELECT
       |    CAST(CASE WHEN abs(rx - qf) > abs(ry - yf) AND abs(rx - qf) > abs(rz - rf)
       |              THEN -ry - rz ELSE rx END AS BIGINT) AS qk,
       |    CAST(CASE WHEN NOT (abs(rx - qf) > abs(ry - yf) AND abs(rx - qf) > abs(rz - rf))
       |               AND NOT (abs(ry - yf) > abs(rz - rf))
       |              THEN -rx - ry ELSE rz END AS BIGINT) AS rk
       |  FROM cube)
       |SELECT concat(CAST(qk AS VARCHAR), ',', CAST(rk AS VARCHAR)) AS hex, count(*) AS n
       |FROM fixed
       |GROUP BY 1
       |ORDER BY hex""".stripMargin

  /** C46c — geo_line agg (OpenSearch `geo_line`: the sorted track of a
    * group's points — fleet paths in dashboards). Points sort by a
    * fixed-width timestamp+rowid key inside `sort_array` (total order,
    * tie-proof — the C5j trick), and coordinates stay INTEGER
    * deci-degrees end to end, so the assembled line string is
    * byte-identical cross-engine. One groupBy; each track's array is
    * bounded by the group's own event count.
    */
  def geoLine(spark: SparkSession, dir: String, maxUsers: Int = 12): DataFrame = {
    val latD = (col("user_id") * 13) % 1600 - 800
    val lonD = (col("event_id") * 17) % 3600 - 1800
    val sk = concat(
      date_format(col("ts"), "yyyyMMddHHmmssSSSSSS"),
      lpad(col("event_id").cast("string"), 12, "0"))
    val pt = concat(lonD.cast("string"), lit(" "), latD.cast("string"))
    Tables.events(spark, dir)
      .filter(col("user_id") < maxUsers)
      .select(col("user_id"), struct(sk.as("sk"), pt.as("p")).as("kp"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        concat(lit("LINESTRING("),
          array_join(transform(sort_array(collect_list(col("kp"))),
            x => x.getItem("p")), ","),
          lit(")")).as("line"))
      .orderBy(col("user_id"))
  }

  val geoLineSql: String =
    """SELECT user_id, count(*) AS n_points,
      |  concat('LINESTRING(',
      |    string_agg(concat(CAST((event_id * 17) % 3600 - 1800 AS VARCHAR), ' ',
      |                      CAST((user_id * 13) % 1600 - 800 AS VARCHAR)),
      |               ',' ORDER BY ts, event_id),
      |    ')') AS line
      |FROM events
      |WHERE user_id < 12
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** C47b — geo_distance SORT (the other half of C47's rings: hits
    * ordered by distance from a point — "nearest events first" in
    * Discover). Haversine runs as one fixed column expression (both
    * engines compute identical doubles from the same 0.1°-grid
    * inputs), and orderBy+limit plans as TakeOrderedAndProject — a
    * bounded heap per partition + k-row merge, never a global sort.
    * event_id tiebreak keeps equal-distance grid points deterministic.
    */
  def geoSort(spark: SparkSession, dir: String,
              lat0: Double = 10.0, lon0: Double = 20.0, k: Int = 25): DataFrame = {
    val dLat = radians(latCol - lat0)
    val dLon = radians(lonCol - lon0)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lit(lat0))) * cos(radians(latCol)) * pow(sin(dLon / 2), 2)
    val dist = round(lit(2 * 6371.0) * asin(sqrt(a)), 6)
    Tables.events(spark, dir)
      .select(col("event_id"), dist.as("dist_km"))
      .orderBy(col("dist_km"), col("event_id"))
      .limit(k)
  }

  val geoSortSql: String =
    s"""WITH g AS (
       |  SELECT event_id, $latSql AS lat, $lonSql AS lon FROM events)
       |SELECT event_id,
       |  round(2 * 6371.0 * asin(sqrt(
       |    pow(sin(radians(lat - 10.0) / 2), 2) +
       |    cos(radians(10.0)) * cos(radians(lat)) * pow(sin(radians(lon - 20.0) / 2), 2))), 6) AS dist_km
       |FROM g
       |ORDER BY dist_km, event_id
       |LIMIT 25""".stripMargin

  /** C46 — geotile_grid at zoom z: standard web-mercator (slippy-map)
    * tile indices, the exact arithmetic OpenSearch's geotile_grid keys
    * encode (`z/x/y`).
    */
  def geotileGrid(spark: SparkSession, dir: String, zoom: Int = 4): DataFrame = {
    val nTiles = 1 << zoom
    val latR = radians(latCol)
    val xScale = (lonCol + 180.0) / 360.0 * nTiles
    val yScale = (lit(1.0) - log(tan(latR) + lit(1.0) / cos(latR)) / lit(math.Pi)) / 2.0 * nTiles
    Tables.events(spark, dir)
      .select(
        floor(round(xScale, 9)).cast("long").as("tile_x"),
        floor(round(yScale, 9)).cast("long").as("tile_y"))
      .groupBy(col("tile_x"), col("tile_y"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("tile_x"), col("tile_y"))
  }

  val geotileGridSql: String =
    s"""WITH g AS (
       |  SELECT radians($latSql) AS lat_r, $lonSql AS lon FROM events)
       |SELECT
       |  CAST(floor(round((lon + 180.0) / 360.0 * 16, 9)) AS BIGINT) AS tile_x,
       |  CAST(floor(round((1.0 - ln(tan(lat_r) + 1.0 / cos(lat_r)) / pi()) / 2.0 * 16, 9)) AS BIGINT) AS tile_y,
       |  count(*) AS n
       |FROM g
       |GROUP BY 1, 2
       |ORDER BY tile_x, tile_y""".stripMargin

  /** C47 — geo_distance rings: haversine km from a fixed origin
    * (0°, 0°), bucketed into OpenSearch-style distance rings. The
    * distance is quantized to INTEGER km (floor over a 6-decimal
    * round) before anything is compared: km-wide quanta put every
    * bucket/min/max boundary ~11 orders of magnitude beyond libm's
    * cross-engine divergence, where 3-decimal floats would not.
    */
  def geoDistance(spark: SparkSession, dir: String): DataFrame = {
    val latR = radians(latCol)
    val lonR = radians(lonCol)
    // haversine with origin (0,0): cos(phi1) = 1, deltas = coords
    val sLat = sin(latR / 2)
    val sLon = sin(lonR / 2)
    val a = sLat * sLat + cos(latR) * sLon * sLon
    val dKm = floor(round(lit(2 * 6371.0) * asin(sqrt(a)), 6)).cast("long")
    Tables.events(spark, dir)
      .select(dKm.as("d_km"))
      .withColumn("ring",
        when(col("d_km") < 2500, "lt2500")
          .when(col("d_km") < 7500, "2500-7500")
          .when(col("d_km") < 12500, "7500-12500")
          .otherwise("gte12500"))
      .groupBy(col("ring"))
      .agg(count(lit(1)).as("n"),
        min(col("d_km")).as("min_km"), max(col("d_km")).as("max_km"))
      .orderBy(col("ring"))
  }

  val geoDistanceSql: String =
    s"""WITH g AS (
       |  SELECT CAST(floor(round(2 * 6371.0 * asin(sqrt(
       |      sin(radians($latSql) / 2) * sin(radians($latSql) / 2)
       |      + cos(radians($latSql)) * sin(radians($lonSql) / 2) * sin(radians($lonSql) / 2))), 6)) AS BIGINT) AS d_km
       |  FROM events)
       |SELECT CASE WHEN d_km < 2500 THEN 'lt2500'
       |            WHEN d_km < 7500 THEN '2500-7500'
       |            WHEN d_km < 12500 THEN '7500-12500'
       |            ELSE 'gte12500' END AS ring,
       |  count(*) AS n, min(d_km) AS min_km, max(d_km) AS max_km
       |FROM g
       |GROUP BY 1
       |ORDER BY ring""".stripMargin

  /** C48 — geo_bounds + geo_centroid per event_type: bounding box
    * (order-free min/max on grid doubles) and centroid (mean rounded
    * to 4 decimals — 0.1°-grid inputs leave summation-order noise ~9
    * orders of magnitude below the rounding cut).
    */
  def geoBounds(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), latCol.as("lat"), lonCol.as("lon"))
      .groupBy(col("event_type"))
      .agg(
        min(col("lat")).as("min_lat"), max(col("lat")).as("max_lat"),
        min(col("lon")).as("min_lon"), max(col("lon")).as("max_lon"),
        round(avg(col("lat")), 4).as("centroid_lat"),
        round(avg(col("lon")), 4).as("centroid_lon"))
      .orderBy(col("event_type"))

  val geoBoundsSql: String =
    s"""SELECT event_type,
       |  min($latSql) AS min_lat, max($latSql) AS max_lat,
       |  min($lonSql) AS min_lon, max($lonSql) AS max_lon,
       |  round(avg($latSql), 4) AS centroid_lat,
       |  round(avg($lonSql), 4) AS centroid_lon
       |FROM events
       |GROUP BY 1
       |ORDER BY event_type""".stripMargin

  /** C46d — geo_polygon / geo_shape containment filter. A CONVEX
    * polygon's interior is the intersection of its edges' half-planes,
    * so containment is a conjunction of cross-product sign tests —
    * pure multiply/compare column arithmetic (no transcendentals, no
    * point-in-polygon ray walk), identical IEEE ops in both engines,
    * and a predicate Catalyst pushes/codegens like any other. Concave
    * shapes decompose into convex pieces OR'd together — same machinery.
    * Demo polygon: a (lon, lat) diamond over the southern band the
    * synthesized grid populates at every SF (small SFs have few users,
    * so lats cluster near the low end of the grid), CCW.
    */
  val polygon: Seq[(Double, Double)] =
    Seq((-120.0, -60.0), (0.0, -85.0), (120.0, -60.0), (0.0, -35.0))

  private def insideConvex(lon: Column, lat: Column): Column =
    polygon.indices.map { i =>
      val (x1, y1) = polygon(i)
      val (x2, y2) = polygon((i + 1) % polygon.length)
      (lit(x2 - x1) * (lat - lit(y1)) - lit(y2 - y1) * (lon - lit(x1))) >= 0
    }.reduce(_ && _)

  def geoPolygon(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        latCol.as("lat"), lonCol.as("lon"),
        // centroid sums run in INTEGER deci-degrees — summation order
        // can never move a rounded double centroid across a boundary
        ((col("user_id") * 13) % 1600 - 800).as("lat_d"),
        ((col("event_id") * 17) % 3600 - 1800).as("lon_d"))
      .filter(insideConvex(col("lon"), col("lat")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("lat_d")).cast("double") / (count(lit(1)) * 10), 4)
          .as("centroid_lat"),
        round(sum(col("lon_d")).cast("double") / (count(lit(1)) * 10), 4)
          .as("centroid_lon"))
      .orderBy(col("event_type"))

  val geoPolygonSql: String = {
    val poly = polygon
    val tests = poly.indices.map { i =>
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % poly.length)
      s"(($x2 - $x1) * (lat - $y1) - ($y2 - $y1) * (lon - $x1)) >= 0"
    }.mkString("\n  AND ")
    s"""WITH pts AS (
       |  SELECT event_type, user_id, $latSql AS lat, $lonSql AS lon,
       |    (user_id * 13) % 1600 - 800 AS lat_d,
       |    (event_id * 17) % 3600 - 1800 AS lon_d
       |  FROM events)
       |SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       |  round(CAST(sum(lat_d) AS DOUBLE) / (count(*) * 10), 4) AS centroid_lat,
       |  round(CAST(sum(lon_d) AS DOUBLE) / (count(*) * 10), 4) AS centroid_lon
       |FROM pts
       |WHERE $tests
       |GROUP BY 1
       |ORDER BY event_type""".stripMargin
  }

  /** C46e — polygon WITH HOLES (geo_shape interior rings): C46d's
    * half-plane conjunction only expresses convex pieces; arbitrary
    * GeoJSON polygons carry holes, and OpenSearch excludes hole
    * interiors. Even-odd ray casting covers both in ONE rule: a point
    * is inside iff a horizontal ray to -∞ crosses an ODD number of
    * edges over ALL rings (outer + holes) — crossing a hole edge flips
    * the parity back out, no decomposition needed. Each edge's
    * crossing test is two compares and one fixed-order multiply/divide
    * over literal vertices — pure codegen'd column arithmetic, the
    * identical IEEE expression the oracle evaluates, summed and tested
    * for parity; Catalyst pushes/codegens the whole predicate like any
    * other scan filter, so at 100 TB it rides the scan. Ring vertices
    * sit on x.x5 offsets so no grid point (deci-degree lattice) ever
    * lands exactly on a vertex ordinate — no boundary ties to disagree
    * on. Outer ring: the C46d southern diamond, nudged; hole: a
    * smaller concentric diamond whose interior is excluded.
    */
  val polygonRings: Seq[Seq[(Double, Double)]] = Seq(
    Seq((-120.05, -60.05), (-0.05, -85.05), (119.95, -60.05), (-0.05, -35.05)),
    Seq((-40.05, -60.05), (-0.05, -73.05), (39.95, -60.05), (-0.05, -47.05)))

  private def rayCrossings(lon: Column, lat: Column): Column =
    polygonRings.flatMap { ring =>
      ring.indices.map { i =>
        val (x1, y1) = ring(i)
        val (x2, y2) = ring((i + 1) % ring.length)
        val crosses = (lit(y1) > lat) =!= (lit(y2) > lat)
        val xi = (lit(x2 - x1) * (lat - lit(y1)) / lit(y2 - y1)) + lit(x1)
        when(crosses && (lon < xi), 1).otherwise(0)
      }
    }.reduce(_ + _)

  /** The containment predicate itself (odd crossing parity) — public
    * so the hole semantics are testable on hand-picked points.
    */
  def insideWithHoles(lon: Column, lat: Column): Column =
    rayCrossings(lon, lat) % 2 === 1

  def geoPolygonHoles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        latCol.as("lat"), lonCol.as("lon"),
        ((col("user_id") * 13) % 1600 - 800).as("lat_d"),
        ((col("event_id") * 17) % 3600 - 1800).as("lon_d"))
      .filter(insideWithHoles(col("lon"), col("lat")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("lat_d")).cast("double") / (count(lit(1)) * 10), 4)
          .as("centroid_lat"),
        round(sum(col("lon_d")).cast("double") / (count(lit(1)) * 10), 4)
          .as("centroid_lon"))
      .orderBy(col("event_type"))

  val geoPolygonHolesSql: String = {
    val terms = polygonRings.flatMap { ring =>
      ring.indices.map { i =>
        val (x1, y1) = ring(i)
        val (x2, y2) = ring((i + 1) % ring.length)
        s"(CASE WHEN (($y1 > lat) <> ($y2 > lat)) AND lon < (($x2 - $x1) * (lat - $y1) / ($y2 - $y1)) + $x1 THEN 1 ELSE 0 END)"
      }
    }.mkString("\n    + ")
    s"""WITH pts AS (
       |  SELECT event_type, user_id, $latSql AS lat, $lonSql AS lon,
       |    (user_id * 13) % 1600 - 800 AS lat_d,
       |    (event_id * 17) % 3600 - 1800 AS lon_d
       |  FROM events)
       |SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       |  round(CAST(sum(lat_d) AS DOUBLE) / (count(*) * 10), 4) AS centroid_lat,
       |  round(CAST(sum(lon_d) AS DOUBLE) / (count(*) * 10), 4) AS centroid_lon
       |FROM pts
       |WHERE ($terms) % 2 = 1
       |GROUP BY 1
       |ORDER BY event_type""".stripMargin
  }

  /** C46g — geo_bounding_box filter (the Discover map-viewport query:
    * every map pan/zoom re-issues the dashboard's aggregations with the
    * viewport as a bounding box). Deliberately NOT a polygon test: a
    * box is two closed ranges, so the filter is four comparisons that
    * stay ordinary range predicates — on a store with materialized
    * coordinate columns they push into the parquet scan as min/max
    * row-group pruning (the reason OpenSearch treats bounding-box as
    * the cheap geo filter and polygon as the expensive one; same plan
    * economics here). The aggregation after the cut is one map-side-
    * combined pass.
    */
  def geoBoundingBox(spark: SparkSession, dir: String,
                     latMin: Double = -80.0, latMax: Double = -60.0,
                     lonMin: Double = -30.0, lonMax: Double = 60.0): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        latCol.as("lat"), lonCol.as("lon"))
      .filter(col("lat").between(latMin, latMax) &&
        col("lon").between(lonMin, lonMax))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("lat")).as("min_lat"), max(col("lat")).as("max_lat"))
      .orderBy(col("event_type"))

  val geoBoundingBoxSql: String =
    s"""WITH g AS (
       |  SELECT event_type, user_id, $latSql AS lat, $lonSql AS lon FROM events)
       |SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       |  min(lat) AS min_lat, max(lat) AS max_lat
       |FROM g
       |WHERE lat BETWEEN -80.0 AND -60.0 AND lon BETWEEN -30.0 AND 60.0
       |GROUP BY 1
       |ORDER BY event_type""".stripMargin
}
