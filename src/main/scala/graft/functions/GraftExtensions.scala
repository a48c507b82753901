package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — the supported way to ship the
  * engine's native expressions into ANY session, including pure-SQL
  * deployments:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   spark.sql("SELECT fingerprint64(content) FROM corpus")
  *
  * (The in-process alternative `FingerprintFunctions.register` covers
  * sessions created without the conf.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")
    ext.injectFunction((FunctionIdentifier("fingerprint64"),
      info("fingerprint64", "fingerprint64(str) - FNV-1a 64-bit content fingerprint"),
      (es: Seq[Expression]) => Fingerprint64(es.head)))
    ext.injectFunction((FunctionIdentifier("rolling_min_hash64"),
      info("rolling_min_hash64", "rolling_min_hash64(str) - winnowing rolling-window min hash"),
      (es: Seq[Expression]) => RollingMinHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of float arrays"),
      (es: Seq[Expression]) => FloatVecDot(es.head, es(1))))
    // whole-operator custom plan: MentionScanPlan → MentionScanExec
    ext.injectPlannerStrategy(_ => graft.plans.MentionScanStrategy)
  }
}
