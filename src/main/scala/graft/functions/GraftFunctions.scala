package graft.functions

import graft.expressions.{DeflateSize, FloatVecDot, GunzipText, LumaGrid, Md5Hash32, Md5Hash60, SrpSign64, WinnowFps}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column
  * API.
  *
  * Two registration paths:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     at session build time (the production wiring);
  *   - [[register]] for injecting into an already-built session (tests,
  *     notebooks).
  */
object GraftFunctions {

  private[functions] val vecDotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
    FloatVecDot(exprs(0), exprs(1))
  }

  private val vecDotInfo =
    new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot")

  private[functions] val gunzipBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"gunzip_text expects 1 argument, got ${exprs.length}")
    GunzipText(exprs.head)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"), vecDotInfo, vecDotBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("gunzip_text"),
      new ExpressionInfo(classOf[GunzipText].getName, "gunzip_text"),
      gunzipBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_fps"), winnowInfo, winnowBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("luma_grid"), lumaGridInfo, lumaGridBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("md5_hash32"), md5Hash32Info, md5Hash32Builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("md5_hash60"), md5Hash60Info, md5Hash60Builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("srp_sign64"), srpSign64Info, srpSign64Builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("deflate_size"), deflateSizeInfo, deflateSizeBuilder)
  }

  private[functions] val deflateSizeBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"deflate_size expects 1 argument, got ${exprs.length}")
    DeflateSize(exprs.head)
  }

  private val deflateSizeInfo =
    new ExpressionInfo(classOf[DeflateSize].getName, "deflate_size")

  private[functions] val srpSign64Builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"srp_sign64 expects 1 argument, got ${exprs.length}")
    SrpSign64(exprs.head, SrpSign64.DefaultPlanes)
  }

  private val srpSign64Info =
    new ExpressionInfo(classOf[SrpSign64].getName, "srp_sign64")

  private[functions] val md5Hash32Builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"md5_hash32 expects 1 argument, got ${exprs.length}")
    Md5Hash32(exprs.head)
  }

  private val md5Hash32Info =
    new ExpressionInfo(classOf[Md5Hash32].getName, "md5_hash32")

  private[functions] val md5Hash60Builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"md5_hash60 expects 1 argument, got ${exprs.length}")
    Md5Hash60(exprs.head)
  }

  private val md5Hash60Info =
    new ExpressionInfo(classOf[Md5Hash60].getName, "md5_hash60")

  private[functions] val lumaGridBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"luma_grid expects (str, brightness), got ${exprs.length} args")
    val brightness = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"luma_grid brightness must be an int literal, got $other")
    }
    LumaGrid(exprs(0), brightness)
  }

  private val lumaGridInfo =
    new ExpressionInfo(classOf[LumaGrid].getName, "luma_grid")

  private[functions] val winnowBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"winnow_fps expects (str, k, w), got ${exprs.length} args")
    def intLit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"winnow_fps $name must be an int literal, got $other")
    }
    WinnowFps(exprs(0), intLit(exprs(1), "k"), intLit(exprs(2), "w"))
  }

  private val winnowInfo =
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps")

  /** Column-API surface for winnowing fingerprints. */
  def winnowFps(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(c), k, w))

  /** Column-API surface for the source-edge decompression. */
  def gunzipText(c: Column): Column =
    ColumnBridge.column(GunzipText(ColumnBridge.expression(c)))
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      GraftFunctions.vecDotBuilder
    ))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      GraftFunctions.winnowBuilder
    ))
    ext.injectFunction((
      FunctionIdentifier("gunzip_text"),
      new ExpressionInfo(classOf[GunzipText].getName, "gunzip_text"),
      GraftFunctions.gunzipBuilder
    ))
    ext.injectFunction((
      FunctionIdentifier("luma_grid"),
      new ExpressionInfo(classOf[LumaGrid].getName, "luma_grid"),
      GraftFunctions.lumaGridBuilder
    ))
    ext.injectFunction((
      FunctionIdentifier("md5_hash32"),
      new ExpressionInfo(classOf[Md5Hash32].getName, "md5_hash32"),
      GraftFunctions.md5Hash32Builder
    ))
    ext.injectFunction((
      FunctionIdentifier("md5_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "md5_hash60"),
      GraftFunctions.md5Hash60Builder
    ))
    ext.injectFunction((
      FunctionIdentifier("srp_sign64"),
      new ExpressionInfo(classOf[SrpSign64].getName, "srp_sign64"),
      GraftFunctions.srpSign64Builder
    ))
    ext.injectFunction((
      FunctionIdentifier("deflate_size"),
      new ExpressionInfo(classOf[DeflateSize].getName, "deflate_size"),
      GraftFunctions.deflateSizeBuilder
    ))
    // planning-time guardrail: a condition-less join of two LARGE
    // relations fails loudly instead of running an all-pairs product
    // (graft.plans.CartesianGuard; tunable/disable-able via conf)
    ext.injectOptimizerRule(session => graft.plans.CartesianGuard(session))
  }
}
