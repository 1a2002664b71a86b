package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions entry point (SURVEY §2.12 / builder brief
  * "registered via SparkSessionExtensions"): native function surface +
  * the radius-join optimizer rule.
  *
  * Usable both programmatically (`builder.withExtensions(new
  * GraftExtensions)`) and by config
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_haversine_km"),
      new ExpressionInfo(classOf[HaversineKm].getName, "graft_haversine_km"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          s"graft_haversine_km takes (lon1, lat1, lon2, lat2); got ${args.length}")
        val d = args.map(a => Cast(a, DoubleType): Expression)
        HaversineKm(d(0), d(1), d(2), d(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      DotProduct.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_nt_unescape"),
      new ExpressionInfo(classOf[NtUnescape].getName, "graft_nt_unescape"),
      NtUnescape.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_nq_terms"),
      new ExpressionInfo(classOf[NqTerms].getName, "graft_nq_terms"),
      NqTerms.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_nt_escape"),
      new ExpressionInfo(classOf[NtEscape].getName, "graft_nt_escape"),
      NtEscape.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      JaroWinkler.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_sf_relate"),
      new ExpressionInfo(classOf[SfRelate].getName, "graft_sf_relate"),
      SfRelate.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      NfcNormalize.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_wkt_bbox"),
      new ExpressionInfo(classOf[WktBbox].getName, "graft_wkt_bbox"),
      WktBbox.builder))
    GeomConstruct.UnaryNames.foreach { case (name, op) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GeomConstruct].getName, name),
        GeomConstruct.unaryBuilder(name, op)))
    }
    GeomConstruct.BinaryNames.foreach { case (name, op) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GeomOverlay].getName, name),
        GeomConstruct.binaryBuilder(name, op)))
    }
    GeomConstruct.MeasureNames.foreach { case (name, op) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GeomMeasure].getName, name),
        GeomConstruct.measureBuilder(name, op)))
    }
    ext.injectFunction((
      FunctionIdentifier("graft_st_buffer"),
      new ExpressionInfo(classOf[GeomBuffer].getName, "graft_st_buffer"),
      GeomConstruct.bufferBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_st_buffer_m"),
      new ExpressionInfo(classOf[GeomBufferMetres].getName,
        "graft_st_buffer_m"),
      GeomConstruct.bufferMetresBuilder))
    ext.injectOptimizerRule(_ => RadiusJoinRewrite)
    ext.injectOptimizerRule(_ => SpatialRelateJoinRewrite)
    // Post-operator-batch slot (runs ONCE, after InferFiltersFromConstraints
    // et al.) — the same placement Spark gives its own InjectRuntimeFilter:
    // inside the fixed-point batch, constraint inference would mirror the
    // injected might_contain back onto the build side through the join
    // equality, bloom-filtering the build against itself.
    ext.injectPreCBORule(_ => BloomJoinInject)
  }
}
