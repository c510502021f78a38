package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's custom Catalyst expressions, so the
  * `spark.sql(...)` surface (ref R4, SparkSQLOperator.java:18-23) can call
  * them like built-ins:
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT portable_hash(text) FROM documents
  *
  * Two entry points, same registrations:
  *  - [[GraftFunctions.register]] — imperative, on an existing session
  *    (what tests and notebooks use);
  *  - [[GraftExtensions]] — `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=graft.functions.GraftExtensions`, the
  *    config-driven path a cluster deployment uses.
  */
object GraftFunctions {

  /** name → (usage, builder). All builders validate arity here; type
    * checking happens in each expression's checkInputDataTypes. */
  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", "cosine_sim(array<float>, array<float>) - sequential-fold cosine",
      { args =>
        require(args.length == 2, "cosine_sim takes 2 arguments")
        CosineSim(args(0), args(1))
      }),
    ("portable_hash", "portable_hash(str) - engine-portable 60-bit md5 hash",
      { args =>
        require(args.length == 1, "portable_hash takes 1 argument")
        // built directly in Catalyst (a Column round-trip would leave an
        // unresolvable ColumnNodeExpression inside the function builder);
        // same derivation as Portable.phash: conv(substr(md5(s),1,15),16,10)::long
        import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
        import org.apache.spark.sql.types.LongType
        Cast(Conv(Substring(Md5(args.head), Literal(1), Literal(15)),
          Literal(16), Literal(10)), LongType)
      }),
    ("shingle_hashes",
      "shingle_hashes(array<string>, width) - distinct portable n-gram shingle hashes",
      { args =>
        require(args.length == 2, "shingle_hashes takes 2 arguments")
        ShingleHashes(args(0), litInt(args(1), "shingle_hashes width"))
      }),
    ("simhash60", "simhash60(array<string>) - 60-bit majority-vote fingerprint",
      { args =>
        require(args.length == 1, "simhash60 takes 1 argument")
        SimHash60(args.head)
      }),
    ("rolling_fingerprint",
      "rolling_fingerprint(array<string>) - order-sensitive rolling polynomial hash",
      { args =>
        require(args.length == 1, "rolling_fingerprint takes 1 argument")
        RollingFingerprint(args.head)
      }),
    ("sig_match_count",
      "sig_match_count(array<long>, array<long>) - positions where two signatures agree",
      { args =>
        require(args.length == 2, "sig_match_count takes 2 arguments")
        SigMatchCount(args(0), args(1))
      }),
    ("l2_unit", "l2_unit(array<float>) - unit-norm projection; zero-norm -> NULL components",
      { args =>
        require(args.length == 1, "l2_unit takes 1 argument")
        L2Unit(args.head)
      }),
    ("shingle_hashes_all",
      "shingle_hashes_all(array<string>, width) - ALL window hashes in positional order (span masking)",
      { args =>
        require(args.length == 2, "shingle_hashes_all takes 2 arguments")
        ShingleHashesAll(args(0), litInt(args(1), "shingle_hashes_all width"))
      }))

  /** Width-style parameters must be integer literals — they are baked
    * into the generated code, not evaluated per row. */
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(i: Int,
      org.apache.spark.sql.types.IntegerType) => i
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  // 2-arg ExpressionInfo(className, name): the 3-arg overload's middle
  // parameter is the DATABASE, not the usage string
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.GraftFunctions", name)

  /** Imperative registration on a live session. Idempotent. */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), builder)
    }

  /** The injections shared with [[GraftExtensions]]. */
  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, _, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
}

/** Config-driven injector: `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
