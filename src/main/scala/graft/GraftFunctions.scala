package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{ShingleHashes, VecDot}
import graft.functions.Codec.GunzipToString

/** SQL-surface registration for the custom expressions, so `spark.sql`
  * users get the same operators the DataFrame API exposes:
  *
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  *
  * Two entry points, same registrations:
  *  - config path: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (applies before session construction — the standard library hook);
  *  - imperative path: `GraftFunctions.register(spark)` for an existing
  *    session (tests, notebooks).
  */
object GraftFunctions {

  private def two(name: String)(f: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects 2 arguments")
        f(children(0), children(1))
      })

  private def one(name: String)(f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name expects 1 argument")
        f(children(0))
      })

  /** All (identifier, info, builder) triples this library contributes. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("json_tag_append"),
      new ExpressionInfo(getClass.getName, "json_tag_append"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "json_tag_append expects 3 arguments (json, slug, text)")
        def asLit(e: Expression, what: String): String = e match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String,
            org.apache.spark.sql.types.StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"json_tag_append $what must be a literal string, got ${other.sql}")
        }
        graft.expressions.JsonTagAppend(children(0),
          asLit(children(1), "slug"), asLit(children(2), "text"))
      }),
    two("vec_dot")(VecDot(_, _)),
    two("jaccard_sim")(graft.expressions.JaccardSim(_, _)),
    one("gunzip_to_string")(GunzipToString(_)),
    one("simhash64")(graft.expressions.SimHash64(_)),
    one("fingerprint_hash")(graft.expressions.FingerprintHash(_)),
    one("nfc_normalize")(graft.expressions.NfcNormalize(_)),
    one("json_schema_profile")(graft.expressions.JsonSchemaProfile(_)),
    two("shingle_hashes") { (ws, n) =>
      val width = n match {
        case Literal(v: Int, _) => v
        case other =>
          // a non-foldable arg (e.g. a column ref) would throw an opaque
          // internal error from eval() during analysis — reject it clearly
          require(other.foldable,
            s"shingle_hashes width must be a literal int, got ${other.sql}")
          other.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case x => throw new IllegalArgumentException(
              s"shingle_hashes width must be a literal int, got $x")
          }
      }
      ShingleHashes(ws, width)
    })

  /** Imperative registration on a live session. Also registers the
    * tag-set UDAF (an Aggregator needs the session-scoped udf registry —
    * there is no extensions injection point for it).
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftbridge.registerFunction(spark, id, info, builder)
    }
    spark.udf.register("tag_set_agg",
      org.apache.spark.sql.functions.udaf(graft.functions.TagSetAgg,
        org.apache.spark.sql.Encoders.product[graft.streaming.AnsModel.Tag]))
  }
}

/** THE config-path hook — the ONE extensions entry point (r15 verdict
  * #4: functions and planner rules used to live behind two same-named
  * classes in different packages, and a user passing either conf key
  * silently lost half the surface):
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * installs BOTH halves of the library's session surface:
  *  - the SQL function registry (every [[GraftFunctions.all]] entry);
  *  - the footer-catalog planner rules via
  *    [[graft.plans.PlannerRules.inject]] — join ORDER then broadcast
  *    STRATEGY, active only when `spark.graft.catalogDir` is set
  *    (sound-by-abstention otherwise).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    graft.plans.PlannerRules.inject(ext)
  }
}
