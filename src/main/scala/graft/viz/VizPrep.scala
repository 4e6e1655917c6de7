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
}
