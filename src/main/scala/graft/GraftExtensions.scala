package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, InterleaveBits, Md5MinMaxShingles,
  MinHashSigs, SimHash64, WinnowFps}
import org.apache.spark.sql.catalyst.expressions.Literal

/** SparkSessionExtensions entry point: registers the engine's native
  * functions at session build time, so SQL users get them without any
  * imperative `register()` call:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectFunction(GraftExtensions.simhash64Descriptor)
    ext.injectFunction(GraftExtensions.minhashSigsDescriptor)
    ext.injectFunction(GraftExtensions.md5MinMaxDescriptor)
    ext.injectFunction(GraftExtensions.interleaveBitsDescriptor)
    ext.injectFunction(GraftExtensions.winnowFpsDescriptor)
    // whole-operator extension: plans graft.plans.TopKPerGroup as
    // partial-heap -> shuffle -> final-heap (see TopKOps.topKPerGroup,
    // which also self-registers on sessions built without extensions)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  type FunctionDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotProductDescriptor: FunctionDescriptor = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))

  private def intArg(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  val simhash64Descriptor: FunctionDescriptor = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => SimHash64(exprs(0), intArg(exprs(1))))

  val minhashSigsDescriptor: FunctionDescriptor = (
    FunctionIdentifier("minhash_sigs"),
    new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
    (exprs: Seq[Expression]) =>
      MinHashSigs(exprs(0), intArg(exprs(1)), intArg(exprs(2))))

  val md5MinMaxDescriptor: FunctionDescriptor = (
    FunctionIdentifier("md5_minmax"),
    new ExpressionInfo(classOf[Md5MinMaxShingles].getName, "md5_minmax"),
    (exprs: Seq[Expression]) =>
      Md5MinMaxShingles(exprs(0), intArg(exprs(1))))

  val interleaveBitsDescriptor: FunctionDescriptor = (
    FunctionIdentifier("interleave_bits"),
    new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
    (exprs: Seq[Expression]) =>
      InterleaveBits(exprs(0), exprs(1), intArg(exprs(2))))

  val winnowFpsDescriptor: FunctionDescriptor = (
    FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (exprs: Seq[Expression]) =>
      WinnowFps(exprs(0), intArg(exprs(1)), intArg(exprs(2))))
}
