package graft.viz

import org.apache.spark.sql.DataFrame
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
}
