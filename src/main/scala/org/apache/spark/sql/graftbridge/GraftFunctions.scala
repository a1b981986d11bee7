package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.SparkSessionExtensions

/** Registration of graft's native expressions as SQL functions, both as a
  * `SparkSessionExtensions` class (set `spark.sql.extensions=
  * graft.GraftSparkExtensions` at session build) and imperatively on a live
  * session. SQL users then get e.g.
  *
  *   SELECT graft_poly_hash(text), graft_simhash64(split(text, ' '))
  *   FROM documents
  */
object GraftFunctions {

  /** A literal array-of-strings argument: accepts both the pre-folding
    * `array('a','b')` form (CreateArray of string literals) and an
    * already-folded array literal.
    */
  private def stringSeqArg(e: Expression, name: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
        if children.forall(_.isInstanceOf[Literal]) =>
      children.map(_.asInstanceOf[Literal].value.toString)
    case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)) =>
      data.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$name expects a literal string array, got $other")
  }

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_poly_hash"),
        new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
        (args: Seq[Expression]) => PolyHash(args.head)),
      (FunctionIdentifier("graft_min_window_hash"),
        new ExpressionInfo(classOf[MinWindowHash].getName, "graft_min_window_hash"),
        (args: Seq[Expression]) =>
          MinWindowHash(args.head, intArg(args(1), "graft_min_window_hash(k)"))),
      (FunctionIdentifier("graft_simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
        (args: Seq[Expression]) => SimHash64(args.head)),
      (FunctionIdentifier("graft_minhash_sig"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_sig"),
        (args: Seq[Expression]) =>
          MinHashSignature(args.head, intArg(args(1), "graft_minhash_sig(k)"))),
      (FunctionIdentifier("graft_dot_double"),
        new ExpressionInfo(classOf[DotProductDouble].getName, "graft_dot_double"),
        (args: Seq[Expression]) => DotProductDouble(args.head, args(1))),
      (FunctionIdentifier("graft_equal_count"),
        new ExpressionInfo(classOf[EqualCountLong].getName, "graft_equal_count"),
        (args: Seq[Expression]) => EqualCountLong(args.head, args(1))),
      (FunctionIdentifier("graft_hash_embedding"),
        new ExpressionInfo(classOf[HashEmbedding].getName, "graft_hash_embedding"),
        (args: Seq[Expression]) =>
          HashEmbedding(args.head, intArg(args(1), "graft_hash_embedding(dim)"))),
      (FunctionIdentifier("graft_shingle_hash64"),
        new ExpressionInfo(classOf[ShingleHash64].getName, "graft_shingle_hash64"),
        (args: Seq[Expression]) =>
          ShingleHash64(args.head, intArg(args(1), "graft_shingle_hash64(k)"))),
      (FunctionIdentifier("graft_sorted_intersect"),
        new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect"),
        (args: Seq[Expression]) => SortedIntersectCount(args.head, args(1))),
      (FunctionIdentifier("graft_count_in_set"),
        new ExpressionInfo(classOf[CountInSet].getName, "graft_count_in_set"),
        (args: Seq[Expression]) =>
          CountInSet(args.head, stringSeqArg(args(1), "graft_count_in_set(words)"))))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    // typed Aggregators go through the udf registry (they are UDAFs, not
    // expression builders): per-group top-5 (value, id) pairs
    spark.udf.register("graft_top5",
      org.apache.spark.sql.functions.udaf(graft.functions.TopKAggregator.topK(5),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]()))
  }

  /** Extension hook: inject every graft function. */
  def inject(extensions: SparkSessionExtensions): Unit =
    functions.foreach(extensions.injectFunction)
}
