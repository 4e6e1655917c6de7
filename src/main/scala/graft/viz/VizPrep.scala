package graft.viz

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sequences

/** Viz-prep sinks — graft of the reference's GeoJSON/Leaflet exporter
  * (/root/reference/src/Visualizer.jl:26-364): the ENGINE side is the
  * grouped / downsampled / whitelisted DataFrame plus a GeoJSON text
  * rendering; serving/plotting is out of scope (SURVEY §2.1 S11).
  */
object VizPrep {

  /** One GeoJSON LineString Feature per session from (session, order,
    * x, y) rows: downsample every `every`-th point, cap per session,
    * assemble coordinates in order — all columnar until the final
    * to-string, one shuffle on the session key.
    */
  def geoJsonLines(
      df: DataFrame,
      sessionCol: String,
      orderCols: Seq[String],
      xCol: String,
      yCol: String,
      every: Int = 1,
      cap: Int = 10000
  ): DataFrame = {
    val slim = Sequences.downsample(
      df.select((Seq(col(sessionCol)) ++ orderCols.map(col) :+ col(xCol) :+ col(yCol)): _*),
      sessionCol,
      orderCols,
      every,
      cap
    )
    val ordered = slim
      .groupBy(col(sessionCol))
      .agg(
        sort_array(collect_list(struct((orderCols.map(col) :+ col(xCol).as("x") :+ col(yCol).as("y")): _*)))
          .as("pts")
      )
    ordered.select(
      col(sessionCol).as("session"),
      size(col("pts")).as("n_points"),
      concat(
        lit("""{"type":"Feature","properties":{"session":""""),
        col(sessionCol),
        lit(""""},"geometry":{"type":"LineString","coordinates":["""),
        concat_ws(",", transform(col("pts"), p => concat(lit("["), p("x"), lit(","), p("y"), lit("]")))),
        lit("]}}")
      ).as("geojson")
    )
  }

  /** Per-point Feature export with property whitelist, every-Nth
    * sampling and a per-session point cap — the reference's point-layer
    * exporter composed as one sink prep
    * (/root/reference/src/Visualizer.jl:185-251: property subset +
    * `max_points` + stride sampling). Coordinates are fixed to 6 dp via
    * DECIMAL so the rendered string is engine-portable; whitelisted
    * properties are rendered as JSON string values in the given order.
    * Columnar end to end: downsample (one session-key shuffle) + a
    * select — no UDF.
    */
  def geoJsonPoints(
      df: DataFrame,
      sessionCol: String,
      orderCols: Seq[String],
      xCol: String,
      yCol: String,
      props: Seq[String],
      every: Int = 1,
      cap: Int = 10000
  ): DataFrame = {
    val slim = Sequences.downsample(df, sessionCol, orderCols, every, cap)
    def coord(c: String) = round(col(c), 6).cast("decimal(18,6)").cast("string")
    // JSON-escape property values (backslash and double quote) and fold
    // NULL to "" — an unescaped quote would emit invalid GeoJSON, and a
    // NULL inside concat would null the WHOLE feature string
    def jsonVal(p: String) =
      coalesce(regexp_replace(col(p).cast("string"), "([\\\\\"])", "\\\\$1"), lit(""))
    val propJson =
      if (props.isEmpty) lit("")
      else
        concat(
          props.zipWithIndex.map { case (p, i) =>
            concat(
              lit((if (i == 0) "" else ",") + "\"" + p + "\":\""),
              jsonVal(p),
              lit("\"")
            )
          }: _*
        )
    val outCols = Seq(col(sessionCol).as("session")) ++ orderCols.map(col) :+
      concat(
        lit("""{"type":"Feature","properties":{"""),
        propJson,
        lit("""},"geometry":{"type":"Point","coordinates":["""),
        coord(xCol),
        lit(","),
        coord(yCol),
        lit("]}}")
      ).as("geojson")
    slim.select(outCols: _*)
  }

  /** Leaflet viewer shell — the reference's index.html + per-path
    * geojson/ directory (/root/reference/src/Visualizer.jl:108-183),
    * completing the S11 surface end to end. The heavy lifting
    * (downsample, cap, ordered assembly) is [[geoJsonLines]] — a
    * distributed plan; this sink then writes one FeatureCollection file
    * per selected session plus the HTML wrapper. The viewer regime is
    * inherently driver-sized (a human looks at tens of paths, not 10^9),
    * so sessions are capped at `maxSessions` with deterministic
    * selection (ascending session key) and the collect is bounded by
    * maxSessions * cap points by construction. Returns the number of
    * geojson files written.
    */
  def writeLeafletViewer(
      spark: SparkSession,
      points: DataFrame,
      sessionCol: String,
      orderCols: Seq[String],
      xCol: String,
      yCol: String,
      outDir: String,
      every: Int = 1,
      cap: Int = 10000,
      maxSessions: Int = 50
  ): Int = {
    val extentRow = points
      .agg(
        min(col(xCol).cast("double")), max(col(xCol).cast("double")),
        min(col(yCol).cast("double")), max(col(yCol).cast("double")))
      .head()
    require((0 until 4).forall(i => !extentRow.isNullAt(i)),
      "writeLeafletViewer: no (castable) coordinates in input")
    val centerX = (extentRow.getDouble(0) + extentRow.getDouble(1)) / 2
    val centerY = (extentRow.getDouble(2) + extentRow.getDouble(3)) / 2

    val lines = geoJsonLines(points, sessionCol, orderCols, xCol, yCol, every, cap)
      .orderBy(col("session").asc)
      .limit(maxSessions)
      .select(col("session").cast("string"), col("geojson"))
      .collect()
    require(lines.nonEmpty, "writeLeafletViewer: no sessions to plot")

    val base = new Path(outDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(base, "geojson"))
    def writeFile(p: Path, content: String): Unit = {
      val out = fs.create(p, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    def safe(name: String) = name.replaceAll("[^A-Za-z0-9._-]", "_")

    // sanitizing can collide two distinct session names ("a b" / "a_b");
    // disambiguate with a numeric suffix instead of silently overwriting
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    val files = lines.map { r =>
      val session = r.getString(0)
      val stem = safe(session)
      val n = seen.getOrElse(stem, 0)
      seen(stem) = n + 1
      val fname = if (n == 0) s"$stem.geojson" else s"${stem}_$n.geojson"
      writeFile(
        new Path(base, s"geojson/$fname"),
        s"""{"type":"FeatureCollection","features":[${r.getString(1)}]}""")
      (fname, session)
    }

    // same shell structure as the reference: leaflet css/js, one fetch
    // per geojson file, per-index styling, popup with session + points
    val layerJs = files.zipWithIndex.map { case ((fname, session), i) =>
      val jsSession = session.replace("\\", "\\\\").replace("'", "\\'")
      s"""    fetch('geojson/$fname').then(r => r.json()).then(data => {
         |      L.geoJSON(data, {
         |        style: () => styleByIndex($i),
         |        onEachFeature: (feature, layer) => {
         |          const props = feature.properties || {};
         |          layer.bindPopup('Session: ' + (props.session || '$jsSession'));
         |        }
         |      }).addTo(map);
         |    }).catch(e => console.warn('Failed to load $fname', e));""".stripMargin
    }.mkString("\n")
    val html =
      s"""<!doctype html>
         |<html>
         |<head>
         |  <meta charset="utf-8" />
         |  <meta name="viewport" content="width=device-width, initial-scale=1.0">
         |  <title>graft Leaflet Viewer</title>
         |  <link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css" />
         |  <style> html, body, #map { height: 100%; margin: 0; padding: 0; } </style>
         |</head>
         |<body>
         |  <div id="map"></div>
         |  <script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
         |  <script>
         |    const map = L.map('map').setView([$centerY, $centerX], 13);
         |    L.tileLayer('https://{s}.tile.openstreetmap.org/{z}/{x}/{y}.png', {
         |      maxZoom: 19, attribution: '&copy; OpenStreetMap contributors'
         |    }).addTo(map);
         |    function styleByIndex(i) {
         |      const colors = ['#1f77b4','#ff7f0e','#2ca02c','#d62728','#9467bd','#8c564b','#e377c2','#7f7f7f','#bcbd22','#17becf'];
         |      return { color: colors[i % colors.length], weight: 3, opacity: 0.8 };
         |    }
         |$layerJs
         |  </script>
         |</body>
         |</html>
         |""".stripMargin
    writeFile(new Path(base, "index.html"), html)
    files.length
  }
}
